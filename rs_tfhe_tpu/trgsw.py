"""TRGSW (GSW over the torus) ciphertexts: gadget encryption, external
product and CMUX — the building blocks of blind rotation.

A batch of TRGSW ciphertexts is uint32 [..., 2L, 2, N]: 2L TRLWE rows with the
gadget Bg^-(i+1) planted on row i's a-polynomial and row (i+L)'s b-polynomial
at coefficient 0 (reference trgsw.rs:11-49).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ops.decompose import gadget_decompose
from .ops.poly import build_step_matrix, polymul_small_by_torus_multi
from .params import TORUS_BITS, TfheParams
from .trlwe import trlwe_encrypt_torus


def trgsw_encrypt_torus(
    key: jax.Array, s1: jax.Array, p: jax.Array, alpha: float,
    params: TfheParams, mask_grid_bits: int = 0,
) -> jax.Array:
    """Encrypt small-integer messages p (uint32 [...]) as TRGSW.

    Returns uint32 [..., 2L, 2, N]. Reference: trgsw.rs:29-49; the gadget
    constants f64_to_torus(Bg^-(i+1)) are the exact powers 2^(32-(i+1)*bgbit).

    mask_grid_bits: reduced-modulus rows for the rounded BSK (see
    trlwe_encrypt_torus). Requires the smallest gadget constant to sit on
    the grid (32 - L*bgbit >= mask_grid_bits) so planting it preserves the
    zeroed low bits.
    """
    g = params.trgsw_lv1
    n = params.n1
    l = g.l
    if mask_grid_bits > 0:
        assert TORUS_BITS - l * g.bgbit >= mask_grid_bits, (
            "gadget constant below the BSK grid; lower bsk_round_bits"
        )
    zeros = jnp.zeros((*p.shape, 2 * l, n), dtype=jnp.uint32)
    ct = trlwe_encrypt_torus(
        key, s1, zeros, alpha, mask_grid_bits=mask_grid_bits
    )  # [..., 2L, 2, N]
    for i in range(l):
        scale = jnp.uint32(1 << (TORUS_BITS - (i + 1) * g.bgbit))
        ct = ct.at[..., i, 0, 0].add(p * scale)
        ct = ct.at[..., i + l, 1, 0].add(p * scale)
    return ct


def external_product(
    trgsw: jax.Array, trlwe: jax.Array, params: TfheParams
) -> jax.Array:
    """TRGSW (x) TRLWE -> TRLWE (reference trgsw.rs:77-116).

    trgsw: uint32 [2L, 2, N] (one evaluation key, shared over the batch);
    trlwe: uint32 [..., 2, N].
    """
    digits = gadget_decompose(trlwe, params)  # [..., 2L, N]
    mat = build_step_matrix(trgsw)
    return polymul_small_by_torus_multi(digits, mat, params.digit_limbs, 2)


def cmux(
    c0: jax.Array, c1: jax.Array, cond: jax.Array, params: TfheParams
) -> jax.Array:
    """cond == 0 -> c0, cond == 1 -> c1 (reference trgsw.rs:174-196).

    cond: TRGSW uint32 [2L, 2, N]; c0/c1: TRLWE uint32 [..., 2, N].
    """
    return c0 + external_product(cond, c1 - c0, params)


def batch_blind_rotate(ct, testvec, bsk, params):
    """Parity alias for the reference's batch_blind_rotate (trgsw.rs:289-305):
    here blind rotation is batch-first, so the batch API IS the API."""
    from .ops.blind_rotate import blind_rotate

    return blind_rotate(ct, testvec, bsk, params)
