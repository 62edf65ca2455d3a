"""Sample extraction: TRLWE -> LWE at a coefficient index.

Reference: rs-tfhe trlwe.rs:106-136. The extracted mask is
p[i] = a[(k - i) mod* N] with negacyclic sign, i.e. a gather with a *static*
index pattern (k is a compile-time constant), so XLA lowers it to pure data
movement. Exact negation is used where the reference uses MAX - x
(see torus.neg_torus).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..torus import neg_torus


def sample_extract(trlwe: jax.Array, k: int = 0) -> jax.Array:
    """uint32 [..., 2, N] -> LWE lv1 [..., N+1] extracting coefficient k."""
    a = trlwe[..., 0, :]
    b = trlwe[..., 1, :]
    n = a.shape[-1]
    idx = (k - np.arange(n)) % (2 * n)
    wrap = idx >= n
    sel = np.where(wrap, idx - n, idx)
    vals = a[..., sel]
    mask = jnp.asarray(wrap)
    p = jnp.where(mask, neg_torus(vals), vals)
    return jnp.concatenate([p, b[..., k][..., None]], axis=-1)


def sample_extract_to_lv0_width(trlwe: jax.Array, n0: int, k: int = 0) -> jax.Array:
    """Truncating variant mirroring the reference's sample_extract_index_2
    (trlwe.rs:122-136) faithfully: the index arithmetic runs with n0 (the
    lv0 width) in place of the ring dimension, i.e.
    p[i] = a[k-i] for i <= k else -a[n0 + k - i], body = b[k] — NOT the
    first n0 entries of the full extract. Exact negation replaces the
    reference's MAX - x (one of the two documented deviations,
    tests/test_reference_oracle.py proves it is the only one here).

    The result is a "hybrid" ciphertext (not decryptable under either key);
    the reference used it for its keyswitch-free MUX path, which its own
    test suite never exercises (it tests mux_naive, gates.rs:672). The
    corrected MUX in gates.py does not need it.
    """
    a = trlwe[..., 0, :]
    b = trlwe[..., 1, :]
    idx = np.arange(n0)
    src = np.where(idx <= k, k - idx, n0 + k - idx)
    wrap = idx > k
    vals = a[..., src]
    p = jnp.where(jnp.asarray(wrap), neg_torus(vals), vals)
    return jnp.concatenate([p, b[..., k][..., None]], axis=-1)
