"""Fused Pallas kernel for the blind-rotation step's external product.

The XLA path (ops/poly.py) materializes the step's circulant operand
(int8 [O, 4, J*N, N] ~ 50 MB at SECURITY_128_BIT) in HBM every scan step and
reads it back into the MXU. This kernel keeps the whole expansion in VMEM:

  per f-tile program:
    load lhs tile [128, J*N] int8 (the decomposed digits)
    for (o, q):                        # output poly x torus limb
      for j:                           # gadget rows
        build W[mi, c] = x_{o,q,j}[(c - mi) mod 2N] by log-doubling
        rolls in VMEM (128 x 2N int8 — never touches HBM)
        for u:                         # m-blocks
          acc += lhs[:, j*N + u*128 : +128] @ W2[:, 2N-128u : +N]   (MXU)
      out_u32 += bitcast(acc) << 8q    # limb recombination, in-register

HBM traffic per step drops from ~115 MB to ~29 MB (lhs + x + u32 out).

Restrictions: digit_limbs == 1 (bgbit <= 7 — the boolean parameter sets) and
N a multiple of 128; other shapes fall back to the XLA path transparently.
Reference semantics: external product accumulate, rs-tfhe trgsw.rs:77-116.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import TORUS_BITS

_BLK = 128  # f-tile and m-block size (MXU native)


def _build_w(x: jax.Array, blk: int) -> jax.Array:
    """W[mi, c] = x[(c - mi) mod 2N] for mi in [0, blk): log-doubling rolls.

    Rolls run in int32 (Mosaic's tpu.dynamic_rotate rejects int8 vectors);
    the result converts back to int8 for the MXU dots.
    """
    w = x[None, :].astype(jnp.int32)
    k = 1
    while k < blk:
        w = jnp.concatenate([w, pltpu.roll(w, k, axis=1)], axis=0)
        k *= 2
    return w.astype(jnp.int8)


def _step_kernel(x_ref, lhs_ref, out_ref, *, n: int, j_rows: int, num_out: int):
    """x_ref: int8 [O, 4, J, 2N]; lhs_ref: int8 [BLK, J*N];
    out_ref: uint32 [BLK, O, N]."""
    two_n = 2 * n
    lhs = lhs_ref[:, :]
    for o in range(num_out):
        uacc = jnp.zeros((_BLK, n), dtype=jnp.uint32)
        for q in range(4):
            acc = jnp.zeros((_BLK, n), dtype=jnp.int32)
            for j in range(j_rows):
                w = _build_w(x_ref[o, q, j, :], _BLK)  # [BLK, 2N]
                w2 = jnp.concatenate([w, w], axis=1)  # [BLK, 4N]
                # stack the n/BLK m-blocks into one [N, N] operand so each
                # gadget row is a single K=N MXU pass
                rhs = jnp.concatenate(
                    [
                        jax.lax.slice(
                            w2, (0, two_n - _BLK * u), (_BLK, two_n - _BLK * u + n)
                        )
                        for u in range(n // _BLK)
                    ],
                    axis=0,
                )  # [N, N]
                acc += jax.lax.dot_general(
                    lhs[:, j * n : (j + 1) * n],
                    rhs,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            shift = 8 * q
            if shift < TORUS_BITS:
                uacc = uacc + (
                    jax.lax.bitcast_convert_type(acc, jnp.uint32)
                    << jnp.uint32(shift)
                )
        out_ref[:, o, :] = uacc


@functools.partial(jax.jit, static_argnames=("num_out", "interpret"))
def fused_external_product(
    lhs: jax.Array, x_limbs: jax.Array, num_out: int = 2, interpret: bool = False
) -> jax.Array:
    """lhs: int8 [F, J*N] digit rows; x_limbs: int8 [O, 4, J, 2N]
    (limb-split negacyclic extension of the step's TRGSW polys).
    Returns uint32 [F, O, N]: sum_j lhs_j (*) t_{j,o} mod 2^32.
    F must be a multiple of 128 and N of 128.
    """
    o, _, j_rows, two_n = x_limbs.shape
    n = two_n // 2
    f = lhs.shape[0]
    assert o == num_out and f % _BLK == 0 and n % _BLK == 0

    kernel = functools.partial(_step_kernel, n=n, j_rows=j_rows, num_out=num_out)
    return pl.pallas_call(
        kernel,
        grid=(f // _BLK,),
        in_specs=[
            pl.BlockSpec(
                (num_out, 4, j_rows, two_n), lambda ft: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((_BLK, j_rows * n), lambda ft: (ft, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_BLK, num_out, n), lambda ft: (ft, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((f, num_out, n), jnp.uint32),
        interpret=interpret,
    )(x_limbs, lhs)
