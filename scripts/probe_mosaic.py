"""Probe current Mosaic (Pallas TPU) capabilities that gate kernel designs.

Round-1 NOTES-PERF.md recorded: Mosaic rejects s16xs16 dots, int8/int16
rolls, and int8<->int32 lane bitcasts. Re-test each on the current JAX
release before committing to the round-2 kernel redesign.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"PASS  {name}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL  {name}: {type(e).__name__}: {msg}")
        return False


def probe_dot(dtype, m, k, n):
    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    a = jnp.ones((m, k), dtype)
    b = jnp.ones((k, n), dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)


def probe_roll(dtype):
    def kernel(a_ref, o_ref):
        o_ref[:] = pltpu.roll(a_ref[:], 5, axis=1)

    a = jnp.ones((8, 256), dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 256), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a)


def probe_bitcast_i32_to_i8():
    def kernel(a_ref, o_ref):
        o_ref[:] = jax.lax.bitcast_convert_type(a_ref[:], jnp.int8).reshape(8, -1)

    a = jnp.ones((8, 256), jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 1024), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a)


def probe_unpack_s16():
    """Extract two s16 limbs from packed int32 via shifts, cast to int16."""
    def kernel(a_ref, o0_ref, o1_ref):
        w = a_ref[:]
        lo = jax.lax.shift_right_arithmetic(
            jnp.left_shift(w, jnp.int32(16)), jnp.int32(16)
        ).astype(jnp.int16)
        hi = jax.lax.shift_right_arithmetic(w, jnp.int32(16)).astype(jnp.int16)
        o0_ref[:] = lo
        o1_ref[:] = hi

    a = jnp.arange(8 * 256, dtype=jnp.int32).reshape(8, 256) * 65537
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((8, 256), jnp.int16)] * 2,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    )(a)


def probe_dot_correct_s16():
    """Check s16 dot wraps correctly mod 2^32 in-kernel."""
    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    rng = np.random.default_rng(0)
    a = rng.integers(-32768, 32768, (128, 1024)).astype(np.int16)
    b = rng.integers(-32768, 32768, (1024, 256)).astype(np.int16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, 256), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(a), jnp.asarray(b))
    want = (a.astype(np.int64) @ b.astype(np.int64)) % (1 << 32)
    got = np.asarray(out).astype(np.int64) % (1 << 32)
    assert np.array_equal(want, got), f"mismatch: {np.abs(want-got).max()}"
    return out


if __name__ == "__main__":
    print("devices:", jax.devices())
    run("dot s8xs8->s32 [128,1024]x[1024,256]", lambda: probe_dot(jnp.int8, 128, 1024, 256))
    run("dot s16xs16->s32 [128,1024]x[1024,256]", lambda: probe_dot(jnp.int16, 128, 1024, 256))
    run("dot s32xs32->s32 [128,1024]x[1024,256]", lambda: probe_dot(jnp.int32, 128, 1024, 256))
    run("dot s16 CORRECTNESS (wrap mod 2^32)", probe_dot_correct_s16)
    run("roll int8", lambda: probe_roll(jnp.int8))
    run("roll int16", lambda: probe_roll(jnp.int16))
    run("roll int32", lambda: probe_roll(jnp.int32))
    run("bitcast i32->i8 in-kernel", probe_bitcast_i32_to_i8)
    run("unpack 2x s16 from i32 via shifts", probe_unpack_s16)
