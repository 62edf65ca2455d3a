"""Microbenchmarks of Mosaic kernel primitives on the real TPU.

Calibrates the round-2 kernel redesign: dot orientation (weight-stationary
overhead at different M), s8 dot rates at the shapes the Nussbaumer-in-VMEM
design would use, and VPU roll/add rates for the transform stages.

Methodology per NOTES-PERF.md: the host round-trip through the device
tunnel is 30 ms - 2 s of RANDOM latency, so each timed pallas_call must run
SECONDS of real chained work (grid sized from an optimistic cost model);
data threads through the carry so nothing folds; scalar host read as the
barrier; best of 2 timed runs.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

TARGET_SECS = 2.5
INNER = 8  # chained ops per grid step


def _run(fn, *args):
    jax.block_until_ready(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.device_get(jnp.ravel(out)[0]))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_dot(m, k, n, dtype=jnp.int8, label=""):
    """Each chained dot's FULL lhs depends on the previous dot's output
    (rolled int32 result folded back into the m x k operand) so the MXU
    cannot overlap or elide iterations."""
    est = (m * k * n) / 150e12 + 1e-6  # optimistic per-dot estimate
    reps = max(8, int(TARGET_SECS / (est * (1 if m * k * 4 > (2 << 20) else INNER))))

    # full [m, k] feedback when it fits VMEM comfortably (INNER chained
    # dots, zero dead code); else INNER=1 with the whole result written to
    # o_ref every grid step (serialized through the ref, ~1.5us/step grid
    # overhead — fine for multi-us dots)
    big = m * k * 4 > (2 << 20)
    inner = 1 if big else INNER
    fm = 8 if big else m

    def kernel(a_ref, b_ref, o_ref, fb_ref):
        r = pl.program_id(0)

        @pl.when(r == 0)
        def _():
            fb_ref[:] = jnp.zeros_like(fb_ref)

        fb = fb_ref[:]  # [fm, k] int32 feedback
        for _ in range(inner):
            dep = jnp.sum(fb, axis=0, keepdims=True) if big else fb
            a = (a_ref[:].astype(jnp.int32) + (dep & 1)).astype(dtype)
            acc = jax.lax.dot_general(
                a, b_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [m, n]
            # fold the result back into an [fm, k] feedback term
            rows = acc[:fm, :]
            if n >= k:
                fb = rows[:, :k] + (rows[:, -1:] & 1)  # touch last cols too
            else:
                fb = jnp.concatenate([rows] * (k // n), axis=1)
        fb_ref[:] = fb
        o_ref[:] = acc

    a = jnp.ones((m, k), dtype)
    b = jnp.ones((k, n), dtype)
    f = jax.jit(
        lambda a, b: pl.pallas_call(
            kernel,
            grid=(reps,),
            in_specs=[
                pl.BlockSpec((m, k), lambda r: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda r: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((m, n), lambda r: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((fm, k), lambda r: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((m, n), jnp.int32),
                jax.ShapeDtypeStruct((fm, k), jnp.int32),
            ],
        )(a, b)
    )

    def g(a, b):
        return f(a, b)[0]

    dt = _run(g, a, b)
    per = dt / (reps * inner)
    macs = m * k * n
    print(
        f"dot s8 [{m:4},{k:4}]x[{k:4},{n:4}]: {per*1e6:8.2f} us/dot  "
        f"{macs/per/1e12:6.1f} TMAC/s  {label}",
        flush=True,
    )
    return per


def bench_roll_add(rows, cols, label=""):
    est = rows * cols * 4 / 2e12 + 0.3e-6
    reps = max(8, int(TARGET_SECS / (est * INNER * 2)))

    def kernel(a_ref, o_ref):
        r = pl.program_id(0)

        @pl.when(r == 0)
        def _():
            o_ref[:] = a_ref[:]

        x = o_ref[:]
        for i in range(INNER * 2):
            x = x + pltpu.roll(x, 1 + i, axis=1)
        o_ref[:] = x

    a = jnp.ones((rows, cols), jnp.int32)
    f = jax.jit(
        lambda a: pl.pallas_call(
            kernel,
            grid=(reps,),
            in_specs=[pl.BlockSpec((rows, cols), lambda r: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, cols), lambda r: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.int32),
        )(a)
    )
    dt = _run(f, a)
    per = dt / (reps * INNER * 2)
    bytes_out = rows * cols * 4
    print(
        f"roll+add i32 [{rows:4},{cols:4}]: {per*1e6:8.3f} us/op  "
        f"{bytes_out/per/1e12:6.2f} TB/s  {label}",
        flush=True,
    )
    return per


def safe(fn, *args, **kw):
    try:
        return fn(*args, **kw)
    except Exception as e:
        print(f"FAIL {args} {kw}: {type(e).__name__}: {str(e).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    print("--- dot orientation: same 134 MMACs, different M ---")
    safe(bench_dot, 128, 1024, 1024, label="current kernel shape")
    safe(bench_dot, 1024, 1024, 128, label="transposed (small rhs)")
    safe(bench_dot, 256, 1024, 512)
    print("--- larger fused dots (537 MMAC) ---")
    safe(bench_dot, 128, 4096, 1024, label="j-stacked K")
    safe(bench_dot, 4096, 1024, 128, label="transposed, j-stacked M")
    safe(bench_dot, 128, 1024, 4096, label="q,o-merged columns")
    safe(bench_dot, 256, 1024, 2048)
    print("--- Nussbaumer pointwise shapes (m=128) ---")
    safe(bench_dot, 128, 768, 1024, label="[FB,6j*m]x[6j*m,8(oq)*m]")
    safe(bench_dot, 128, 512, 1024, label="L=2 variant")
    safe(bench_dot, 1024, 768, 128, label="transposed")
    print("--- small-K penalty check ---")
    safe(bench_dot, 128, 128, 128)
    safe(bench_dot, 128, 128, 1024)
    safe(bench_dot, 128, 256, 1024)
    print("--- VPU roll+add rates ---")
    safe(bench_roll_add, 128, 1024)
    safe(bench_roll_add, 128, 128)
    safe(bench_roll_add, 8, 1024)
    safe(bench_roll_add, 256, 2048)
