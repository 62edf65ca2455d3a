"""Multi-limb gadget-digit path (digit_limbs > 1).

The Uint2-8 parameter sets use bgbit in [18, 23] (reference params.rs:148-376),
so one signed digit spans up to 3 int8 limbs. TEST_TINY (bgbit=6) never
exercises that path; this tiny wide-digit set does — through decomposition,
external product, and a full programmable bootstrap."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_tfhe_tpu import tlwe
from rs_tfhe_tpu.bootstrap import LutBootstrap
from rs_tfhe_tpu.key import CloudKey, SecretKey
from rs_tfhe_tpu.ops.decompose import gadget_decompose
from rs_tfhe_tpu.ops.poly import schoolbook_negacyclic
from rs_tfhe_tpu.params import TfheParams, TlweParams, TrgswParams, TrlweParams
from rs_tfhe_tpu.trgsw import external_product, trgsw_encrypt_torus
from rs_tfhe_tpu.trlwe import trlwe_decrypt_bool, trlwe_encrypt_bool

#: Uint2-shaped tiny set: bgbit=18 -> digits in [-2^17, 2^17), 3 int8 limbs.
TEST_TINY_WIDE = TfheParams(
    security_bits=0,
    description="insecure tiny wide-digit set (bgbit=18, L=1)",
    tlwe_lv0=TlweParams(n=16, alpha=1.0e-9),
    tlwe_lv1=TlweParams(n=64, alpha=1.0e-14),
    trlwe_lv1=TrlweParams(n=64, alpha=1.0e-14),
    trgsw_lv1=TrgswParams(n=64, nbit=6, bgbit=18, l=1, basebit=4, iks_t=3, alpha=1.0e-14),
)


@pytest.fixture(scope="module")
def wide_sk():
    return SecretKey.generate(jax.random.key(21), TEST_TINY_WIDE)


@pytest.fixture(scope="module")
def wide_ck(wide_sk):
    return CloudKey.generate(jax.random.key(22), wide_sk)


def test_digit_limbs_property():
    assert TEST_TINY_WIDE.digit_limbs == 3


def test_decomposition_recomposes(rng):
    """Recompose digits with powers of Bg and compare against the rounded
    input (reference trgsw.rs:372-424)."""
    p = TEST_TINY_WIDE
    g = p.trgsw_lv1
    x = jnp.asarray(rng.integers(0, 1 << 32, (4, 2, p.n1), dtype=np.uint32))
    d = np.asarray(gadget_decompose(x, p)).astype(np.int64)  # [4, 2L, N]
    d = d.reshape(4, 2, g.l, p.n1)
    recomposed = np.zeros((4, 2, p.n1), dtype=np.uint32)
    for i in range(g.l):
        scale = np.uint32((1 << (32 - (i + 1) * g.bgbit)) & 0xFFFFFFFF)
        recomposed += (d[:, :, i].astype(np.uint32)) * scale
    # recomposition matches x up to the dropped low bits (< Bg^-L resolution)
    err = (recomposed - np.asarray(x)).astype(np.int32)
    tol = 1 << (32 - g.l * g.bgbit)
    assert np.abs(err.astype(np.int64)).max() <= tol


def test_external_product_by_one_is_identity(wide_sk, rng):
    """TRGSW(1) (x) TRLWE decrypts to the same plaintext
    (reference trgsw.rs:426-466) — through the 3-limb matmul."""
    p = TEST_TINY_WIDE
    msgs = jnp.asarray(rng.integers(0, 2, (4, p.n1)).astype(bool))
    ct = trlwe_encrypt_bool(jax.random.key(1), wide_sk.lv1, msgs, p.trlwe_lv1.alpha)
    one = trgsw_encrypt_torus(
        jax.random.key(2), wide_sk.lv1, jnp.uint32(1), p.trgsw_lv1.alpha, p
    )
    out = external_product(one, ct, p)
    assert bool(jnp.all(trlwe_decrypt_bool(out, wide_sk.lv1) == msgs))


def test_programmable_bootstrap_wide(wide_sk, wide_ck, rng):
    """Full LUT bootstrap at bgbit=18/L=1 (the Uint-set shape)."""
    m = 4
    msgs = jnp.asarray(np.arange(m))
    ct = tlwe.lwe_encrypt_message(
        jax.random.key(3), wide_sk.lv0, msgs, m, TEST_TINY_WIDE.tlwe_lv0.alpha
    )
    out = LutBootstrap().bootstrap_func(ct, lambda x: (x + 1) % m, m, wide_ck)
    dec = tlwe.lwe_decrypt_message(out, wide_sk.lv0, m)
    np.testing.assert_array_equal(dec, (np.arange(m) + 1) % m)


def test_polymul_multilimb_exact(rng):
    """polymul with 3-limb digits == schoolbook oracle, bit-exact."""
    from rs_tfhe_tpu.ops.poly import polymul_small_by_torus

    n = 64
    d = rng.integers(-(1 << 17), 1 << 17, (2, 3, n), dtype=np.int64).astype(np.int32)
    t = rng.integers(0, 1 << 32, (3, n), dtype=np.uint32)
    got = np.asarray(polymul_small_by_torus(jnp.asarray(d), jnp.asarray(t), 3))
    for b in range(2):
        exp = np.zeros(n, dtype=np.uint32)
        for j in range(3):
            exp += schoolbook_negacyclic(d[b, j].astype(np.uint32), t[j])
        np.testing.assert_array_equal(got[b], exp)
