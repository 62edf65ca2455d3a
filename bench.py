"""Headline benchmark: bootstrapped-gate throughput at 128-bit security.

Default parameter set SECURITY_128_BIT_FAST: identical LWE hardness to the
reference's SECURITY_128_BIT (same n and alpha on both levels) with a leaner
gadget (L=2, Bg=2^8) enabled by our centered decomposition — see params.py.

Measures batched NAND gates/sec (each gate = one full TFHE gate bootstrap:
blind rotate + sample extract + key switch) on the default JAX device and
prints ONE JSON line. Baseline: the reference's ~15 ms/gate single-core claim
(rs-tfhe README.md:217, BASELINE.md) = 66.7 gates/sec.

Env overrides: RS_TFHE_BENCH_BATCH (default 4096), RS_TFHE_BENCH_ITERS
(default 5), RS_TFHE_BENCH_PARAMS (default SECURITY_128_BIT_FAST).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from rs_tfhe_tpu import ALL_SECURITY_SETS  # noqa: E402
from rs_tfhe_tpu.gates import batch_gate  # noqa: E402
from rs_tfhe_tpu.key import CloudKey, SecretKey  # noqa: E402
from rs_tfhe_tpu.tlwe import lwe_decrypt_bool, lwe_encrypt_bool  # noqa: E402

BASELINE_GATES_PER_SEC = 1000.0 / 15.0  # reference: ~15 ms/gate


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    batch = int(os.environ.get("RS_TFHE_BENCH_BATCH", "4096"))  # v5e sweet spot
    iters = int(os.environ.get("RS_TFHE_BENCH_ITERS", "5"))
    pname = os.environ.get("RS_TFHE_BENCH_PARAMS", "SECURITY_128_BIT_FAST")
    params = ALL_SECURITY_SETS[pname]

    log(f"device={jax.devices()[0]} params={pname} batch={batch} iters={iters}")

    t0 = time.perf_counter()
    sk = SecretKey.generate(jax.random.key(42), params)
    ck = CloudKey.generate(jax.random.key(7), sk)
    # scalar host reads as the sync barrier (full-array transfers crawl
    # through the device tunnel; block_until_ready is not a reliable barrier)
    _ = np.asarray(jax.device_get((ck.ksk_limbs.ravel()[0], ck.bsk.ravel()[0])))
    log(f"keygen (incl. compile): {time.perf_counter() - t0:.2f}s")

    rng = np.random.default_rng(0)
    bits_a = rng.integers(0, 2, batch).astype(bool)
    bits_b = rng.integers(0, 2, batch).astype(bool)
    ka, kb = jax.random.split(jax.random.key(3))
    a = lwe_encrypt_bool(ka, sk.lv0, jnp.asarray(bits_a), params.tlwe_lv0.alpha)
    b = lwe_encrypt_bool(kb, sk.lv0, jnp.asarray(bits_b), params.tlwe_lv0.alpha)

    t0 = time.perf_counter()
    out = jax.block_until_ready(batch_gate("nand", a, b, ck))
    log(f"first call (compile + run): {time.perf_counter() - t0:.2f}s")

    dec = np.asarray(jax.device_get(lwe_decrypt_bool(out, sk.lv0)))
    correct = (dec == ~(bits_a & bits_b)).mean()
    log(f"correctness: {correct:.4f}")

    # Chain iterations (each gate consumes the previous output) and force one
    # host read at the end: robust against async-dispatch quirks and any
    # same-input result caching in the device tunnel.
    t0 = time.perf_counter()
    cur = a
    for _ in range(iters):
        cur = batch_gate("nand", cur, b, ck)
    _ = np.asarray(jax.device_get(cur[0, -1]))
    elapsed = time.perf_counter() - t0
    per_iter = elapsed / iters
    log(f"{iters} chained iters: {per_iter * 1e3:.1f} ms each")
    gates_per_sec = batch / per_iter

    result = {
        "metric": "gate_bootstraps_per_sec",
        "value": round(gates_per_sec, 2),
        "unit": "gates/s",
        "vs_baseline": round(gates_per_sec / BASELINE_GATES_PER_SEC, 2),
    }
    if correct < 1.0:
        result["correctness"] = float(correct)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
