"""Split the small-batch gate latency into its stages (diagnosis for the
auto-path anomaly: at B=2/4 the full NAND measured ~22 ms while the blind
rotation alone measures ~8.4 ms — find where the other 14 ms live).

Times, at each batch size, chained (in-jit) variants of the bootstrap
pipeline under step_impl=auto: rotation only, rotation+extract,
rotation+extract+keyswitch, and the full public nand gate.

Usage: python scripts/diag_gate_latency.py [B ...]   (on the real TPU)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import rs_tfhe_tpu as tfhe
import rs_tfhe_tpu.config as C
from rs_tfhe_tpu import gates, tlwe
from rs_tfhe_tpu.gates import _nand_lin
from rs_tfhe_tpu.ops.blind_rotate import blind_rotate
from rs_tfhe_tpu.ops.extract import sample_extract
from rs_tfhe_tpu.ops.keyswitch import identity_key_switch
from rs_tfhe_tpu.params import ALL_SECURITY_SETS


def timeit(fn, *args, iters=20, repeats=3):
    """Min over repeats: single-shot timings through the tunnel
    occasionally read 10-100x high (hiccups)."""
    r = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        r = fn(*args)
        _ = np.asarray(jax.device_get(jnp.ravel(r)[0]))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main() -> None:
    pname = os.environ.get("RS_TFHE_BENCH_PARAMS", "SECURITY_128_BIT_FAST")
    # Force a step implementation (auto/fused/fused_small/..) to diagnose
    # one routing branch in isolation.
    C.config.step_impl = os.environ.get("RS_TFHE_STEP_IMPL", "auto")
    params = ALL_SECURITY_SETS[pname]
    batches = [int(x) for x in sys.argv[1:]] or [2]
    print(f"device={jax.devices()[0]} params={pname} "
          f"step_impl={C.config.step_impl}", file=sys.stderr)

    sk = tfhe.SecretKey.generate(jax.random.key(42), params)
    ck = tfhe.CloudKey.generate(jax.random.key(7), sk)
    iters = 20

    for batch in batches:
        rng = np.random.default_rng(0)
        bits = rng.integers(0, 2, (2, batch)).astype(bool)
        ka, kb = jax.random.split(jax.random.key(3))
        a = tlwe.lwe_encrypt_bool(ka, sk.lv0, jnp.asarray(bits[0]),
                                  params.tlwe_lv0.alpha)
        b = tlwe.lwe_encrypt_bool(kb, sk.lv0, jnp.asarray(bits[1]),
                                  params.tlwe_lv0.alpha)

        # Each chained stage feeds a full-rank function of its output back
        # into the next iteration's lv0 ciphertext (prevents XLA DCE).
        @jax.jit
        def rot_only(x, y, key):
            for _ in range(iters):
                lin = _nand_lin(x, y)
                acc = blind_rotate(lin, key.testvec, key.bsk, key.params,
                                   bsk_packed=key.bsk_packed)
                x = x + acc[:, 0, : x.shape[1]].astype(jnp.uint32)
            return x

        @jax.jit
        def rot_extract(x, y, key):
            for _ in range(iters):
                lin = _nand_lin(x, y)
                acc = blind_rotate(lin, key.testvec, key.bsk, key.params,
                                   bsk_packed=key.bsk_packed)
                lv1 = sample_extract(acc, 0)
                x = x + lv1[:, : x.shape[1]]
            return x

        @jax.jit
        def full_bs(x, y, key):
            for _ in range(iters):
                lin = _nand_lin(x, y)
                acc = blind_rotate(lin, key.testvec, key.bsk, key.params,
                                   bsk_packed=key.bsk_packed)
                lv1 = sample_extract(acc, 0)
                x = identity_key_switch(lv1, key.ksk_limbs, key.params)
            return x

        @jax.jit
        def gate_chain(x, y, key):
            for _ in range(iters):
                x = gates.nand(x, y, key)
            return x

        row = {"batch": batch}
        for name, fn in [("rot", rot_only), ("rot+ext", rot_extract),
                         ("rot+ext+ks", full_bs), ("nand", gate_chain)]:
            row[name + "_ms"] = round(timeit(fn, a, b, ck), 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
