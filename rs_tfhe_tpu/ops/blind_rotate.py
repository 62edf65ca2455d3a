"""Batched blind rotation: the TFHE bootstrap hot loop, TPU-first.

Reference: rs-tfhe trgsw.rs:198-274. The n0-step CMUX chain is inherently
sequential per ciphertext (each step consumes the previous accumulator), so —
exactly as the reference scales by batching independent ciphertexts across CPU
threads (trgsw.rs:289-305) — we batch ciphertexts on-chip: a `lax.scan` over
the n0 steps where every step processes the whole [B, 2, N] accumulator batch:

  step i:  rot   = X^{a~_i} * acc            (per-batch monomial rotation)
           diff  = rot - acc
           d     = gadget_decompose(diff)    [B, 2L, N]   (VPU bit ops)
           delta = d (x) BSK_i               (exact limb matmul on the MXU)
           acc   = acc + delta               (== CMUX(acc, rot; BSK_i))

Two BSK layouts (config.bsk_mode):
  - "onthefly":    the step matrix (limb circulants) is built inside the scan
                   from the [2L, 2, N] coefficient polys — BSK stays a few MB.
  - "precomputed": all n0 step matrices are materialized at CloudKey
                   preparation and streamed from HBM (fast, huge memory).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import TORUS_BITS, TfheParams
from .decompose import gadget_decompose
from .poly import build_step_matrix, monomial_rotate, polymul_small_by_torus_multi


def modswitch(x: jax.Array, params: TfheParams) -> jax.Array:
    """Round torus values to [0, 2N) (reference trgsw.rs:202-211)."""
    nbit = params.trgsw_lv1.nbit
    rnd = jnp.uint32(1 << (TORUS_BITS - nbit - 2))
    return ((x + rnd) >> jnp.uint32(TORUS_BITS - nbit - 1)).astype(jnp.int32)


def blind_rotate(
    ct: jax.Array,
    testvec: jax.Array,
    bsk: jax.Array,
    params: TfheParams,
    precomputed: bool = False,
) -> jax.Array:
    """Blind-rotate a batch of lv0 LWE ciphertexts.

    ct:      uint32 [B, n0+1]
    testvec: uint32 [2, N] (shared) or [B, 2, N] (per-ciphertext LUTs)
    bsk:     onthefly:    uint32 [n0, 2L, 2, N]   (TRGSW coefficient polys)
             precomputed: int8   [n0, 2L*N, 2*4*N] (step matrices)
    Returns the accumulator TRLWE batch, uint32 [B, 2, N].
    """
    g = params.trgsw_lv1
    n0, n1 = params.n0, params.n1
    batch = ct.shape[0]
    d_limbs = params.digit_limbs

    b_til = (2 * n1 - modswitch(ct[:, n0], params)) % (2 * n1)  # [B]
    a_til = modswitch(ct[:, :n0], params)  # [B, n0]

    tv = jnp.broadcast_to(testvec, (batch, 2, n1))
    acc0 = monomial_rotate(tv, b_til[:, None])

    def step(acc, xs):
        bsk_i, a_i = xs
        rot = monomial_rotate(acc, a_i[:, None])
        diff = rot - acc
        digits = gadget_decompose(diff, params)  # [B, 2L, N]
        mat = bsk_i if precomputed else build_step_matrix(bsk_i)
        delta = polymul_small_by_torus_multi(digits, mat, d_limbs, 2)
        return acc + delta, None

    acc, _ = jax.lax.scan(step, acc0, (bsk, a_til.T))
    return acc
