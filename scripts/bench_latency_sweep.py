"""Map the B = 1..128 gate-latency region (VERDICT r4 item 2).

The auto-route previously had measured evidence only at B <= 2 (commuted /
multi-bit kernels) and B >= 128 (per-tile / wide); in between, gates rode
whatever kernel the eligibility rules picked with stale round-2 numbers.
This sweep measures slope-method gate latency at every batch in
{1, 2, 4, 8, 16, 32, 64, 128} for SECURITY_128_BIT_FAST and the literal
SECURITY_128_BIT, across every eligible kernel:

  auto           — the production routing as-is
  fused_small    — commuted Hankel-operand kernel (eligible B <= 8)
  fused_small_mb — pair-grouped multi-bit kernel (eligible B <= 8, mb key)
  fused_tile     — per-tile kernel at fb = select_fb(B)
  fused_wide     — step-major wide kernel (padded to 128; where eligible)

Timing: chain-length slope (t_long - t_short)/(long - short), min over
repeats — the canonical method (NOTES-PERF.md; single-shot tunnel timings
hiccup 10-100x). Chains kept short (2, 7) to bound Mosaic compile time;
the slope is over 5 gates.

    python scripts/bench_latency_sweep.py              # both sets
    python scripts/bench_latency_sweep.py --fast-only

Writes LATENCY_SWEEP_r05.json at the repo root; bench_suite.py publishes
the table into BENCH_SUITE.json.
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

import rs_tfhe_tpu as tfhe  # noqa: E402
from rs_tfhe_tpu import gates, tlwe  # noqa: E402
from rs_tfhe_tpu.config import config  # noqa: E402

SHORT, LONG, REPEATS = 2, 7, 4
BATCHES = [1, 2, 4, 8, 16, 32, 64, 128]


def slope_ms(a, b, ck, impl: str) -> float:
    """Per-gate ms at this batch via the chain-length slope under a forced
    step_impl (gates._gate2 keys its jit cache on it)."""
    config.step_impl = impl

    def build(n):
        @jax.jit
        def chained(x, y, k):
            for _ in range(n):
                out = gates.nand(x, y, k)
                s = jnp.sum(jnp.ravel(out).astype(jnp.uint32)) & jnp.uint32(1)
                x = out.at[..., -1].add(s + jnp.uint32(1))
            return x

        return chained

    def min_time(fn):
        out = fn(a, b, ck)
        _ = np.asarray(jax.device_get(jnp.ravel(out)[0]))
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            out = fn(a, b, ck)
            _ = np.asarray(jax.device_get(jnp.ravel(out)[0]))
            best = min(best, time.perf_counter() - t0)
        return best

    try:
        dt = (min_time(build(LONG)) - min_time(build(SHORT))) / (LONG - SHORT)
    finally:
        config.step_impl = "auto"
    return dt * 1e3


def main():
    sets = ["SECURITY_128_BIT_FAST"]
    if "--fast-only" not in sys.argv:
        sets.append("SECURITY_128_BIT")
    rows = []
    print(f"device: {jax.devices()[0]}", flush=True)
    for pname in sets:
        p = tfhe.ALL_SECURITY_SETS[pname]
        sk = tfhe.SecretKey.generate(jax.random.key(42), p)
        ck = tfhe.CloudKey.generate(jax.random.key(7), sk)
        ck_mb = tfhe.CloudKey.generate(jax.random.key(7), sk, multibit=True)
        rng = np.random.default_rng(1)

        from rs_tfhe_tpu.ops.blind_rotate import _FB_WIDE
        from rs_tfhe_tpu.ops.pallas_blind_rotate import (
            mb_small_eligible, small_eligible, wide_eligible,
        )

        for batch in BATCHES:
            bits = rng.integers(0, 2, batch).astype(bool)
            a = tlwe.lwe_encrypt_bool(jax.random.key(3), sk.lv0,
                                      jnp.asarray(bits), p.tlwe_lv0.alpha)
            b = tlwe.lwe_encrypt_bool(jax.random.key(4), sk.lv0,
                                      jnp.asarray(~bits), p.tlwe_lv0.alpha)
            impls: list[tuple[str, object]] = [("auto", ck), ("auto_mb", ck_mb)]
            if small_eligible(p, batch, 2):
                impls.append(("fused_small", ck))
            if mb_small_eligible(p, batch, 2):
                impls.append(("fused_small_mb", ck_mb))
            if batch > 2:  # tile/wide are what auto would consider anyway
                impls.append(("fused_tile", ck))
                drop = p.bsk_round_bits // 8
                if wide_eligible(p, batch + ((-batch) % _FB_WIDE), 2, drop):
                    impls.append(("fused_wide", ck))
            for name, key in impls:
                impl = "auto" if name == "auto_mb" else name
                t0 = time.perf_counter()
                ms = slope_ms(a, b, key, impl)
                rows.append({"params": pname, "batch": batch, "impl": name,
                             "ms_per_gate_dispatch": round(ms, 3),
                             "gates_per_s": round(batch / ms * 1e3, 1)})
                print(f"  {pname} B={batch:<4} {name:<15} {ms:8.2f} ms "
                      f"({batch / ms * 1e3:8.1f} gates/s) "
                      f"[wall {time.perf_counter() - t0:.0f}s]", flush=True)
        del ck, ck_mb

    out = {"device": str(jax.devices()[0]), "short": SHORT, "long": LONG,
           "rows": rows}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "LATENCY_SWEEP_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("SWEEP-OK", path)


if __name__ == "__main__":
    main()
