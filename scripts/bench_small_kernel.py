"""A/B the commuted Hankel-operand small-batch kernel (fused_small) against
the shrunken-tile fb path at B in {1, 2, 4, 8} — the B=1 gate-latency play
(NOTES-PERF round-3 queue 2: models ~10 ms vs 11.8 ms at fb=8).

Also times the full public-API single gate (gates.nand) under each
step_impl so the end-to-end win (rotation + extract + keyswitch + linear
form) is what gets recorded. Chained iterations + scalar host reads per
NOTES-PERF's measurement traps. Prints one JSON line per batch size and a
FLIP_AUTO verdict: if fused_small wins at B=1, flip the auto heuristic in
ops/blind_rotate.py to route tiny batches through it.

Usage: python scripts/bench_small_kernel.py   (on the real TPU)
Env: RS_TFHE_BENCH_PARAMS (default SECURITY_128_BIT_FAST)
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
from rs_tfhe_tpu.ops.blind_rotate import select_fb
from rs_tfhe_tpu.ops.pallas_blind_rotate import (
    fused_blind_rotate,
    fused_blind_rotate_small,
    prepare_bsk_vecs,
)
from rs_tfhe_tpu.params import ALL_SECURITY_SETS


def time_rotation(batch, params, packed, vecs, drop, iters: int = 10):
    """(ms_tile, ms_small) for the raw rotation with PRE-COMPUTED operands
    — isolates the kernels from the vec-prep cost the gate path pays."""
    n0, n1 = params.n0, params.n1
    rng = np.random.default_rng(1)
    b_til = jnp.asarray(rng.integers(0, 2 * n1, batch), jnp.int32)
    a_til = jnp.asarray(rng.integers(0, 2 * n1, (n0, batch)), jnp.int32)
    tv = jnp.asarray(rng.integers(0, 1 << 32, (2, n1), dtype=np.uint32))
    fb = select_fb(batch, n1)
    pad = (-batch) % fb  # the kernel requires batch % fb == 0 (the gate
    b_p = jnp.pad(b_til, (0, pad))  # path pads identically)
    a_p = jnp.pad(a_til, ((0, 0), (0, pad)))

    @jax.jit
    def chain_tile(tv0):
        acc = None
        tvv = tv0
        for _ in range(iters):
            acc = fused_blind_rotate(b_p, a_p, tvv, packed, params,
                                     drop_limbs=drop, fb=fb)
            tvv = acc[0] ^ jnp.uint32(1)
        return acc

    @jax.jit
    def chain_small(tv0):
        acc = None
        tvv = tv0
        for _ in range(iters):
            acc = fused_blind_rotate_small(b_til, a_til, tvv, vecs, params,
                                           drop_limbs=drop)
            tvv = acc[0] ^ jnp.uint32(1)
        return acc

    out = []
    for fn in (chain_tile, chain_small):
        r = fn(tv)
        _ = np.asarray(jax.device_get(jnp.ravel(r)[0]))  # compile + settle
        t0 = time.perf_counter()
        r = fn(tv)
        _ = np.asarray(jax.device_get(jnp.ravel(r)[0]))
        out.append((time.perf_counter() - t0) / iters * 1e3)
    return out


def time_gate(a, b, ck, iters: int = 20) -> float:
    """ms per chained single gate at the CURRENT config.step_impl.

    Gates chain INSIDE one jit: separate dispatches through the device
    tunnel measure per-dispatch round-trips (~3-4x the device time at
    B=1), not gate latency. A fresh jit wrapper per call re-reads
    config.step_impl at trace time; ck rides as an argument so the
    CloudKey is not inlined as HLO constants (NOTES-PERF)."""

    @jax.jit
    def chained(x, y, key):
        for _ in range(iters):
            x = gates.nand(x, y, key)
        return x

    _ = jax.block_until_ready(chained(a, b, ck))  # compile
    best = float("inf")
    for _ in range(3):  # min over repeats: tunnel hiccups read 3-100x high
        t0 = time.perf_counter()
        r = chained(a, b, ck)
        _ = np.asarray(jax.device_get(r[0, -1]))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main() -> None:
    pname = os.environ.get("RS_TFHE_BENCH_PARAMS", "SECURITY_128_BIT_FAST")
    params = ALL_SECURITY_SETS[pname]
    print(f"device={jax.devices()[0]} params={pname}", file=sys.stderr)

    sk = tfhe.SecretKey.generate(jax.random.key(42), params)
    ck = tfhe.CloudKey.generate(jax.random.key(7), sk)
    rng = np.random.default_rng(0)
    drop = params.bsk_round_bits // 8
    vecs = jax.block_until_ready(prepare_bsk_vecs(ck.bsk, drop_limbs=drop))

    flip = False
    for batch in (1, 2, 4, 8):
        ms_rt_tile, ms_rt_small = time_rotation(batch, params, ck.bsk_packed,
                                                vecs, drop)
        print(json.dumps({
            "batch": batch,
            "rotation_ms_tile": round(ms_rt_tile, 2),
            "rotation_ms_small": round(ms_rt_small, 2),
        }), flush=True)
        bits_a = rng.integers(0, 2, batch).astype(bool)
        bits_b = rng.integers(0, 2, batch).astype(bool)
        ka, kb = jax.random.split(jax.random.key(3))
        a = tlwe.lwe_encrypt_bool(ka, sk.lv0, jnp.asarray(bits_a),
                                  params.tlwe_lv0.alpha)
        b = tlwe.lwe_encrypt_bool(kb, sk.lv0, jnp.asarray(bits_b),
                                  params.tlwe_lv0.alpha)

        C.config.step_impl = "auto"
        ms_auto = time_gate(a, b, ck)

        C.config.step_impl = "fused_small"
        out = gates.nand(a, b, ck)
        dec = np.asarray(jax.device_get(tlwe.lwe_decrypt_bool(out, sk.lv0)))
        ok = bool((dec == ~(bits_a & bits_b)).all())
        ms_small = time_gate(a, b, ck)
        C.config.step_impl = "auto"

        if batch == 1 and ok and ms_small < ms_auto:
            flip = True
        print(json.dumps({
            "batch": batch,
            "gate_ms_auto": round(ms_auto, 2),
            "gate_ms_fused_small": round(ms_small, 2),
            "small_correct": ok,
            "small_wins": ms_small < ms_auto,
        }), flush=True)

    print(f"FLIP_AUTO={flip}", flush=True)


if __name__ == "__main__":
    main()
