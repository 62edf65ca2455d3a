"""Exact negacyclic polynomial arithmetic vs the schoolbook oracle.

Mirrors the reference's FFT-oracle tests (fft/mod.rs:136-255) — but our
matmul path must match the integer oracle *exactly* (zero tolerance), a
stronger guarantee than the reference's +/-1 ulp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_tfhe_tpu import torus
from rs_tfhe_tpu.config import config
from rs_tfhe_tpu.ops import poly

N = 64


def _schoolbook_i64(a, b):
    """Independent quadratic oracle (no circulant machinery).

    uint64 wrapping arithmetic: wrap mod 2^64 is harmless modulo 2^32.
    """
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    n = len(a)
    out = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(n):
            for j in range(n):
                k = i + j
                if k < n:
                    out[k] += a[i] * b[j]
                else:
                    out[k - n] -= a[i] * b[j]
    return (out & np.uint64(0xFFFFFFFF)).astype(np.uint32)


def test_oracle_self_consistency(rng):
    a = rng.integers(0, 2**32, N, dtype=np.uint32)
    b = rng.integers(0, 2**32, N, dtype=np.uint32)
    assert np.array_equal(poly.schoolbook_negacyclic(a, b), _schoolbook_i64(a, b))


def test_limb_split_roundtrip(rng):
    x = jnp.asarray(rng.integers(0, 2**32, 256, dtype=np.uint32))
    limbs = torus.split_u32_limbs(x)
    rec = sum(
        jax.lax.bitcast_convert_type(limbs[..., p].astype(jnp.int32), jnp.uint32)
        << np.uint32(8 * p)
        for p in range(4)
    )
    assert bool(jnp.all(rec == x))
    # edge cases
    edges = jnp.asarray(
        np.array([0, 1, 2**31, 2**31 - 1, 2**32 - 1, 128, 2**24], dtype=np.uint32)
    )
    le = torus.split_u32_limbs(edges)
    rece = sum(
        jax.lax.bitcast_convert_type(le[..., p].astype(jnp.int32), jnp.uint32)
        << np.uint32(8 * p)
        for p in range(4)
    )
    assert bool(jnp.all(rece == edges))


def test_polymul_torus_by_binary(rng):
    a = rng.integers(0, 2**32, N, dtype=np.uint32)
    s = rng.integers(0, 2, N).astype(np.uint32)
    ref = poly.schoolbook_negacyclic(a, s)
    got = np.asarray(poly.polymul_torus_by_binary(jnp.asarray(a), jnp.asarray(s)))
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("d_limbs,dmax", [(1, 32), (3, 2**21)])
def test_polymul_small_by_torus(rng, d_limbs, dmax):
    J = 6
    d = rng.integers(-dmax, dmax, (J, N), dtype=np.int64).astype(np.int32)
    t = rng.integers(0, 2**32, (J, N), dtype=np.uint32)
    ref = np.zeros(N, np.uint32)
    for j in range(J):
        du = (d[j].astype(np.int64) % 2**32).astype(np.uint32)
        ref = ref + poly.schoolbook_negacyclic(du, t[j])
    got = np.asarray(
        poly.polymul_small_by_torus(jnp.asarray(d), jnp.asarray(t), d_limbs)
    )
    assert np.array_equal(got, ref)


def test_polymul_multi_output(rng):
    J, O = 4, 2
    d = rng.integers(-32, 32, (3, J, N), dtype=np.int64).astype(np.int32)
    t = rng.integers(0, 2**32, (J, O, N), dtype=np.uint32)
    mat = poly.build_step_matrix(jnp.asarray(t))
    got = np.asarray(poly.polymul_small_by_torus_multi(jnp.asarray(d), mat, 1, O))
    for bidx in range(3):
        for o in range(O):
            ref = np.zeros(N, np.uint32)
            for j in range(J):
                du = (d[bidx, j].astype(np.int64) % 2**32).astype(np.uint32)
                ref = ref + poly.schoolbook_negacyclic(du, t[j, o])
            assert np.array_equal(got[bidx, o], ref)


def test_monomial_rotate(rng):
    a = rng.integers(0, 2**32, N, dtype=np.uint32)
    for k in [0, 1, N - 1, N, N + 1, 2 * N - 1, 2 * N]:
        mono = np.zeros(N, np.uint32)
        kk = k % (2 * N)
        if kk < N:
            mono[kk] = 1
        else:
            mono[kk - N] = np.uint32(2**32 - 1)
        ref = poly.schoolbook_negacyclic(a, mono)
        got = np.asarray(poly.monomial_rotate(jnp.asarray(a), jnp.asarray(np.int32(k))))
        assert np.array_equal(got, ref), f"k={k}"


def test_bf16_dot_path(rng):
    J = 6
    d = rng.integers(-32, 32, (J, N), dtype=np.int64).astype(np.int32)
    t = rng.integers(0, 2**32, (J, N), dtype=np.uint32)
    ref = np.asarray(poly.polymul_small_by_torus(jnp.asarray(d), jnp.asarray(t), 1))
    old = config.dot_impl
    try:
        config.dot_impl = "bf16"
        got = np.asarray(
            poly.polymul_small_by_torus(jnp.asarray(d), jnp.asarray(t), 1)
        )
    finally:
        config.dot_impl = old
    assert np.array_equal(got, ref)
