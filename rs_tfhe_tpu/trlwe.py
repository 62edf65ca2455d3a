"""TRLWE (ring-LWE over the torus) ciphertexts, batch-first.

A batch of TRLWE ciphertexts is uint32 [..., 2, N]: index 0 on the -2 axis is
the mask polynomial a(X), index 1 the body b(X) (reference trlwe.rs:10-14).
The mask-key product a(X)*s(X) runs through the exact limb-matmul negacyclic
multiplier (ops/poly.py) instead of the reference's f64 FFT.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ops.poly import polymul_torus_by_binary
from .torus import f64_to_torus, gaussian_torus, uniform_torus


def trlwe_encrypt_torus(
    key: jax.Array, s1: jax.Array, mu: jax.Array, alpha: float,
    mask_grid_bits: int = 0,
) -> jax.Array:
    """Encrypt torus polynomials. s1: uint32 [N] binary; mu: uint32 [..., N].

    Reference: trlwe.rs:30-52 (b = mu + noise + a (*) s).

    mask_grid_bits = g > 0 produces a reduced-modulus sample (used for the
    rounded BSK, params.bsk_round_bits): the mask is drawn uniformly from
    the 2^g-grid of the torus, so a (*) s stays ON the grid exactly (binary
    secret), and b is rounded to the grid afterwards. The only extra error
    is the rounding of (noise + mu) on b — uniform in +/- 2^(g-33) of the
    torus, NOT amplified by the secret. Security: equivalent to LWE with
    modulus 2^(32-g) at the same absolute noise, i.e. a strictly larger
    noise-to-modulus ratio than the full-torus sample.
    """
    n = s1.shape[0]
    k_mask, k_noise = jax.random.split(key)
    a = uniform_torus(k_mask, (*mu.shape[:-1], n))
    if mask_grid_bits > 0:
        g = jnp.uint32(mask_grid_bits)
        a = (a >> g) << g  # uniform on the grid
    noise = gaussian_torus(k_noise, alpha, mu.shape)
    b = mu + noise + polymul_torus_by_binary(a, s1)
    if mask_grid_bits > 0:
        half = jnp.uint32(1 << (mask_grid_bits - 1))
        b = ((b + half) >> g) << g  # round-to-nearest, wrapping
    return jnp.stack([a, b], axis=-2)


def trlwe_encrypt_bool(
    key: jax.Array, s1: jax.Array, msg: jax.Array, alpha: float
) -> jax.Array:
    """Per-coefficient boolean +/- 1/8 encoding (reference trlwe.rs:55-66)."""
    mu_true = jnp.uint32(int(f64_to_torus(0.125)))
    mu_false = jnp.uint32(int(f64_to_torus(-0.125)))
    mu = jnp.where(jnp.asarray(msg), mu_true, mu_false)
    return trlwe_encrypt_torus(key, s1, mu, alpha)


def trlwe_phase(ct: jax.Array, s1: jax.Array) -> jax.Array:
    """b - a (*) s (mod 2^32): uint32 [..., N]."""
    return ct[..., 1, :] - polymul_torus_by_binary(ct[..., 0, :], s1)


def trlwe_decrypt_bool(ct: jax.Array, s1: jax.Array) -> jax.Array:
    """Per-coefficient sign test (reference trlwe.rs:69-81)."""
    return jax.lax.bitcast_convert_type(trlwe_phase(ct, s1), jnp.int32) >= 0
