"""Exact negacyclic polynomial arithmetic in Z_{2^32}[X]/(X^N + 1).

TPU-first design: instead of porting the reference's f64 negacyclic FFT
(rs-tfhe fft/klemsa.rs:88-174 and the SPQLIOS AVX/FMA assembly), polynomial
products are computed as *integer-exact matrix multiplications on the MXU*:

  1. Extend t to t_ext = [t, -t] of length 2N; then the negacyclic product
     (d * t)[n] = sum_m d[m] * t_ext[(n - m) mod 2N], i.e. a matmul of d
     against the "negacyclic circulant" matrix C[m, n] = t_ext[(n-m) mod 2N].
  2. Split both operands into balanced signed 8-bit limbs (torus.py), so each
     limb-level contraction accumulates exactly in int32 (or float32 when
     chunked), with zero rounding error.
  3. Recombine limb products with shifts modulo 2^32.

This is *more* exact than the reference (whose FFT carries +/-1 ulp rounding,
fft/mod.rs:136-159) and keeps the hot loop on the systolic array instead of
scalar FFT butterflies.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config
from ..torus import (
    TORUS_DTYPE,
    neg_torus,
    recombine_limb_products,
    split_digit_limbs,
    split_u32_limbs,
)

# ---------------------------------------------------------------------------
# Exact integer dot products (MXU path)
# ---------------------------------------------------------------------------

#: float32 holds integers exactly up to 2^24; limb products are <= 2^14, so a
#: contraction chunk of 1024 keeps every partial sum <= 2^24.
_BF16_CHUNK = 1024


def exact_dot_i8(lhs: jax.Array, rhs: jax.Array) -> jax.Array:
    """Integer-exact contraction of int8 operands: [..., K] x [K, M] -> int32.

    With dot_impl="int8" this is a native s8xs8->s32 dot (1 MXU pass). With
    "bf16" the contraction is chunked so f32 accumulation stays exact.
    """
    if config.dot_impl == "int8":
        return jax.lax.dot_general(
            lhs,
            rhs,
            (((lhs.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    k = lhs.shape[-1]
    out = None
    for start in range(0, k, _BF16_CHUNK):
        stop = min(start + _BF16_CHUNK, k)
        part = jax.lax.dot_general(
            lhs[..., start:stop].astype(jnp.bfloat16),
            rhs[start:stop].astype(jnp.bfloat16),
            (((lhs.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        out = part if out is None else out + part
    return out


# ---------------------------------------------------------------------------
# Negacyclic structure helpers
# ---------------------------------------------------------------------------

def negacyclic_extend(t: jax.Array) -> jax.Array:
    """uint32 [..., N] -> [..., 2N] with the negated second period."""
    return jnp.concatenate([t, neg_torus(t)], axis=-1)


def _circulant_index(n: int) -> np.ndarray:
    """Static index matrix I[m, c] = (c - m) mod 2N, so that
    C[m, c] = t_ext[I[m, c]] is the negacyclic circulant of t."""
    m = np.arange(n)[:, None]
    c = np.arange(n)[None, :]
    return ((c - m) % (2 * n)).astype(np.int32)


def circulant_limbs(t: jax.Array) -> jax.Array:
    """Build int8 circulant limb matrices from torus polynomials.

    t: uint32 [..., N]  ->  int8 [..., N(m), N(n), 4(limb)].
    """
    n = t.shape[-1]
    ext = split_u32_limbs(negacyclic_extend(t))  # [..., 2N, 4]
    idx = jnp.asarray(_circulant_index(n))
    return ext[..., idx, :]


# ---------------------------------------------------------------------------
# Exact negacyclic products
# ---------------------------------------------------------------------------

def polymul_small_by_torus(d: jax.Array, t: jax.Array, d_limbs: int) -> jax.Array:
    """Exact negacyclic product of small-integer polys with torus polys.

    d: int32 [..., J, N]  (|coeff| < 2^(8*d_limbs - 1), e.g. gadget digits)
    t: uint32 [J, N]      (shared across the batch, e.g. TRGSW rows)
    Returns uint32 [..., N] = sum_j d_j * t_j  (negacyclic, mod 2^32).
    """
    j, n = t.shape
    rhs = circulant_limbs(t)  # [J, N, N, 4]
    rhs = rhs.transpose(0, 1, 3, 2).reshape(j * n, 4 * n)  # [(J,m), (q,n)]
    lhs = split_digit_limbs(d, d_limbs)  # [..., J, N, dk]
    lhs = jnp.moveaxis(lhs, -1, -3).reshape(*d.shape[:-2], d_limbs, j * n)
    out = exact_dot_i8(lhs, rhs)  # [..., dk, 4*N] int32
    out = out.reshape(*out.shape[:-1], 4, n)  # [..., dk, q, n]
    out = jnp.moveaxis(out, -1, -3)  # [..., n, dk, q]
    return recombine_limb_products(out)


def build_step_matrix(t: jax.Array) -> jax.Array:
    """Build the exact-convolution matmul operand for a set of torus polys.

    t: uint32 [J, O, N] (e.g. one bootstrapping-key step: J = 2L gadget rows,
    O = 2 output polys a/b). Returns int8 [J*N, O*4*N]: the limb-split
    negacyclic circulants laid out so that a single contraction over (j, m)
    produces all (o, limb q, n) outputs.
    """
    j, o, n = t.shape
    c = circulant_limbs(t)  # [J, O, N(m), N(n), 4(q)]
    return c.transpose(0, 2, 1, 4, 3).reshape(j * n, o * 4 * n)


def polymul_small_by_torus_multi(
    d: jax.Array, step_matrix: jax.Array, d_limbs: int, num_out: int
) -> jax.Array:
    """out[..., o, n] = sum_j d[..., j, :] (*) t[j, o, :]  (negacyclic, exact).

    d: int32 [..., J, N]; step_matrix: int8 [J*N, O*4*N] from
    build_step_matrix. This is the external-product core (reference
    trgsw.rs:77-116) recast as one MXU contraction.
    """
    jn = step_matrix.shape[0]
    n = step_matrix.shape[1] // (num_out * 4)
    lhs = split_digit_limbs(d, d_limbs)  # [..., J, N, dk]
    lhs = jnp.moveaxis(lhs, -1, -3).reshape(*d.shape[:-2], d_limbs, jn)
    out = exact_dot_i8(lhs, step_matrix)  # [..., dk, O*4*N] int32
    out = out.reshape(*out.shape[:-1], num_out, 4, n)  # [..., dk, o, q, n]
    out = out.transpose(
        *range(out.ndim - 4), out.ndim - 3, out.ndim - 1, out.ndim - 4, out.ndim - 2
    )  # [..., o, n, dk, q]
    return recombine_limb_products(out)


def polymul_torus_by_binary(a: jax.Array, s: jax.Array) -> jax.Array:
    """Exact negacyclic product a (*) s with binary s (key polynomials).

    a: uint32 [..., N], s: uint32/int [N] with values in {0, 1}.
    Used for TRLWE encryption/decryption (reference trlwe.rs:45, :70).
    """
    n = s.shape[-1]
    # circulant of s as int8 (entries in {-1, 0, 1})
    ext = jnp.concatenate(
        [s.astype(jnp.int8), -s.astype(jnp.int8)], axis=-1
    )  # [2N]
    idx = jnp.asarray(_circulant_index(n))
    rhs = ext[idx]  # [N, N] int8; C[m, n'] = +/- s[...]
    lhs = split_u32_limbs(a)  # [..., N, 4]
    lhs = jnp.moveaxis(lhs, -1, -2)  # [..., 4, N]
    out = exact_dot_i8(lhs, rhs)  # [..., 4, N] int32  (|sum| <= N*128 < 2^24)
    # recombine: value[n] = sum_q out[q, n] << 8q; shape to [..., N, 1, 4]
    # (dummy digit-limb axis, torus-limb axis last).
    out = jnp.moveaxis(out, -2, -1)[..., None, :]
    return recombine_limb_products(out)


def monomial_rotate(t: jax.Array, k: jax.Array) -> jax.Array:
    """Multiply polynomials by X^k in Z[X]/(X^N+1): out[n] = t_ext[(n-k) mod 2N].

    t: uint32 [..., N]; k: integer array broadcastable to t.shape[:-1]
    (values taken mod 2N). Reference: trgsw.rs:307-330 (exact negation used
    here instead of the reference's MAX-x; see torus.neg_torus).
    """
    n = t.shape[-1]
    pos = jnp.arange(n, dtype=jnp.int32)
    idx = jnp.mod(pos - k[..., None].astype(jnp.int32), 2 * n)
    wrap = idx >= n
    vals = jnp.take_along_axis(t, jnp.where(wrap, idx - n, idx), axis=-1)
    return jnp.where(wrap, neg_torus(vals), vals)


# ---------------------------------------------------------------------------
# Reference oracle (host-side, for tests): schoolbook negacyclic product
# ---------------------------------------------------------------------------

def schoolbook_negacyclic(a, b) -> np.ndarray:
    """Exact negacyclic product of two uint32 polynomials, mod 2^32.

    Quadratic host-side oracle mirroring the reference's cross-check
    (fft/mod.rs:240-255) but in exact integer arithmetic.
    """
    a = np.asarray(a, dtype=np.uint32)
    b = np.asarray(b, dtype=np.uint32)
    n = a.shape[-1]
    # wrapping uint32 products, vectorized: out[k] = sum_{i+j=k} a_i b_j with a
    # sign flip on the wrapped half. Build the negacyclic circulant of b.
    i = np.arange(n)[:, None]
    k = np.arange(n)[None, :]
    j = (k - i) % (2 * n)
    b_ext = np.concatenate([b, (np.uint32(0) - b)])
    circ = b_ext[j]  # [i, k]
    with np.errstate(over="ignore"):
        prods = a[:, None] * circ  # uint32 wrapping
        return np.add.reduce(prods, axis=0, dtype=np.uint32)
