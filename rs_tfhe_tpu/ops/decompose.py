"""Gadget (signed base-2^bgbit) decomposition.

Reference: rs-tfhe trgsw.rs:144-171. Batched: operates on whole TRLWE batches
[..., 2, N] at once; pure uint32/int32 bit manipulation (VPU work).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import TORUS_BITS, TfheParams


def gadget_decompose(x: jax.Array, params: TfheParams) -> jax.Array:
    """uint32 [..., 2, N] -> int32 digits [..., 2L, N].

    Digit order matches the reference's TRGSW row order: rows [0, L) are the
    a-polynomial digits, rows [L, 2L) the b-polynomial digits
    (trgsw.rs:158-168). Digits lie in [-Bg/2, Bg/2).
    """
    g = params.trgsw_lv1
    # offset balances the digits; round_bit centers the dropped-bits error
    # (see params.decomposition_round_bit — deviation from the reference
    # that removes its dominant blind-rotation noise term)
    tmp = x + jnp.uint32(
        (params.decomposition_offset + params.decomposition_round_bit)
        & 0xFFFFFFFF
    )
    mask = jnp.uint32(g.bg - 1)
    half = jnp.int32(g.half_bg)
    digits = []
    for i in range(g.l):
        shift = jnp.uint32(TORUS_BITS - (i + 1) * g.bgbit)
        digits.append(((tmp >> shift) & mask).astype(jnp.int32) - half)
    d = jnp.stack(digits, axis=-3)  # [..., L, 2, N]
    d = jnp.swapaxes(d, -3, -2)  # [..., 2, L, N]
    return d.reshape(*d.shape[:-3], 2 * g.l, d.shape[-1])
