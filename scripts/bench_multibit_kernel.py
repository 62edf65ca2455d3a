"""A/B the multi-bit (pair-grouped) small-batch kernel against the standard
commuted small kernel at B in {1, 2} — the single-gate latency play
(NOTES-PERF round-4: one circulant build per TWO mask elements).

Measures (a) the raw rotation with precomputed operands, (b) the full
public-API single gate (gates.nand) through a standard key vs a
multibit=True key under step_impl=auto, and (c) mb gate correctness on
hardware. Chained iterations + scalar host reads per NOTES-PERF's
measurement traps.

Usage: python scripts/bench_multibit_kernel.py   (on the real TPU)
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
from rs_tfhe_tpu.ops.blind_rotate import _mb_k_rows
from rs_tfhe_tpu.ops.pallas_blind_rotate import (
    fused_blind_rotate_small,
    fused_blind_rotate_small_mb,
    mb_rows_per_pattern,
)
from rs_tfhe_tpu.params import ALL_SECURITY_SETS


def time_rotation(batch, params, ck_mb, iters: int = 10):
    """(ms_small, ms_mb) for the raw rotation with precomputed operands."""
    n0, n1 = params.n0, params.n1
    drop = params.bsk_round_bits // 8
    rng = np.random.default_rng(1)
    b_til = jnp.asarray(rng.integers(0, 2 * n1, batch), jnp.int32)
    a_bt = jnp.asarray(rng.integers(0, 2 * n1, (batch, n0)), jnp.int32)
    k_rows = _mb_k_rows(a_bt[:, 0::2], a_bt[:, 1::2], params,
                        mb_rows_per_pattern(params, drop))
    tv = jnp.asarray(rng.integers(0, 1 << 32, (2, n1), dtype=np.uint32))

    @jax.jit
    def chain_small(tv0):
        acc, tvv = None, tv0
        for _ in range(iters):
            acc = fused_blind_rotate_small(b_til, a_bt.T, tvv, ck_mb.bsk_vecs,
                                           params, drop_limbs=drop)
            tvv = acc[0] ^ jnp.uint32(1)
        return acc

    @jax.jit
    def chain_mb(tv0):
        acc, tvv = None, tv0
        for _ in range(iters):
            acc = fused_blind_rotate_small_mb(b_til, k_rows, tvv,
                                              ck_mb.bsk_mb_vecs, params,
                                              drop_limbs=drop)
            tvv = acc[0] ^ jnp.uint32(1)
        return acc

    out = []
    for fn in (chain_small, chain_mb):
        r = fn(tv)
        _ = np.asarray(jax.device_get(jnp.ravel(r)[0]))  # compile + settle
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn(tv)
            _ = np.asarray(jax.device_get(jnp.ravel(r)[0]))
            best = min(best, time.perf_counter() - t0)
        out.append(best / iters * 1e3)
    return out


def time_gate(a, b, ck, iters: int = 20) -> float:
    """ms per chained single gate (see bench_small_kernel.time_gate)."""

    @jax.jit
    def chained(x, y, key):
        for _ in range(iters):
            x = gates.nand(x, y, key)
        return x

    _ = jax.block_until_ready(chained(a, b, ck))  # compile
    best = float("inf")
    for _ in range(3):
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
    t0 = time.perf_counter()
    ck = tfhe.CloudKey.generate(jax.random.key(7), sk)
    t_std = time.perf_counter() - t0
    t0 = time.perf_counter()
    ck_mb = tfhe.CloudKey.generate(jax.random.key(7), sk, multibit=True)
    t_mb = time.perf_counter() - t0
    print(json.dumps({"keygen_std_s": round(t_std, 2),
                      "keygen_mb_s": round(t_mb, 2)}), flush=True)

    rng = np.random.default_rng(0)
    assert C.config.step_impl == "auto"
    batches = tuple(
        int(x) for x in os.environ.get("RS_TFHE_BENCH_BATCHES", "1,2").split(",")
    )
    for batch in batches:
        ms_small, ms_mb = time_rotation(batch, params, ck_mb)
        print(json.dumps({
            "batch": batch,
            "rotation_ms_small": round(ms_small, 2),
            "rotation_ms_mb": round(ms_mb, 2),
            "mb_speedup": round(ms_small / ms_mb, 2),
        }), flush=True)

        bits_a = rng.integers(0, 2, batch).astype(bool)
        bits_b = rng.integers(0, 2, batch).astype(bool)
        ka, kb = jax.random.split(jax.random.key(3))
        a = tlwe.lwe_encrypt_bool(ka, sk.lv0, jnp.asarray(bits_a),
                                  params.tlwe_lv0.alpha)
        b = tlwe.lwe_encrypt_bool(kb, sk.lv0, jnp.asarray(bits_b),
                                  params.tlwe_lv0.alpha)

        ms_std = time_gate(a, b, ck)
        # auto routes mb only at B <= 2; force the kernel beyond that so the
        # crossover can be probed
        if batch > 2:
            C.config.step_impl = "fused_small_mb"
        try:
            out = gates.nand(a, b, ck_mb)  # mb key routes the grouped chain
            dec = np.asarray(
                jax.device_get(tlwe.lwe_decrypt_bool(out, sk.lv0))
            )
            ok = bool((dec == ~(bits_a & bits_b)).all())
            ms_gate_mb = time_gate(a, b, ck_mb)
        finally:
            C.config.step_impl = "auto"
        print(json.dumps({
            "batch": batch,
            "gate_ms_std": round(ms_std, 2),
            "gate_ms_mb": round(ms_gate_mb, 2),
            "mb_correct": ok,
            "mb_wins": ms_gate_mb < ms_std,
        }), flush=True)


if __name__ == "__main__":
    main()
