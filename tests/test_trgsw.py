"""TRGSW algebraic-identity tests (reference trgsw.rs:372-546)."""

import jax
import jax.numpy as jnp

from rs_tfhe_tpu import tlwe, trgsw, trlwe
from rs_tfhe_tpu.ops.blind_rotate import blind_rotate
from rs_tfhe_tpu.ops.decompose import gadget_decompose
from rs_tfhe_tpu.ops.extract import sample_extract
from rs_tfhe_tpu.ops.keyswitch import identity_key_switch
from rs_tfhe_tpu.params import TORUS_BITS

from conftest import BATCH


def test_decomposition_recomposes(tiny, sk, rng):
    """Recompose gadget digits with powers of Bg; decryption must survive
    (reference trgsw.rs:372-424)."""
    g = tiny.trgsw_lv1
    msgs = jnp.asarray(rng.integers(0, 2, (BATCH, tiny.n1)).astype(bool))
    ct = trlwe.trlwe_encrypt_bool(jax.random.key(0), sk.lv1, msgs, tiny.trlwe_lv1.alpha)
    digits = gadget_decompose(ct, tiny)  # [B, 2L, N]
    h = [1 << (TORUS_BITS - (i + 1) * g.bgbit) for i in range(g.l)]
    rec_a = jnp.zeros((BATCH, tiny.n1), dtype=jnp.uint32)
    rec_b = jnp.zeros((BATCH, tiny.n1), dtype=jnp.uint32)
    for i in range(g.l):
        hu = jnp.uint32(h[i])
        rec_a = rec_a + jax.lax.bitcast_convert_type(digits[:, i], jnp.uint32) * hu
        rec_b = rec_b + jax.lax.bitcast_convert_type(digits[:, i + g.l], jnp.uint32) * hu
    rec = jnp.stack([rec_a, rec_b], axis=-2)
    dec = trlwe.trlwe_decrypt_bool(rec, sk.lv1)
    assert bool(jnp.all(dec == msgs))


def test_external_product_identity(tiny, sk, rng):
    """TRGSW(1) (x) c == c up to noise (reference trgsw.rs:426-466)."""
    msgs = jnp.asarray(rng.integers(0, 2, (BATCH, tiny.n1)).astype(bool))
    ct = trlwe.trlwe_encrypt_bool(jax.random.key(1), sk.lv1, msgs, tiny.trlwe_lv1.alpha)
    g1 = trgsw.trgsw_encrypt_torus(
        jax.random.key(2), sk.lv1, jnp.uint32(1), tiny.trgsw_lv1.alpha, tiny
    )
    out = trgsw.external_product(g1, ct, tiny)
    assert bool(jnp.all(trlwe.trlwe_decrypt_bool(out, sk.lv1) == msgs))


def test_cmux_selects(tiny, sk, rng):
    """CMUX picks c0 for TRGSW(0), c1 for TRGSW(1) (reference trgsw.rs:468-505)."""
    m1 = jnp.asarray(rng.integers(0, 2, (BATCH, tiny.n1)).astype(bool))
    m2 = ~m1
    c1 = trlwe.trlwe_encrypt_bool(jax.random.key(3), sk.lv1, m1, tiny.trlwe_lv1.alpha)
    c2 = trlwe.trlwe_encrypt_bool(jax.random.key(4), sk.lv1, m2, tiny.trlwe_lv1.alpha)
    g0 = trgsw.trgsw_encrypt_torus(
        jax.random.key(5), sk.lv1, jnp.uint32(0), tiny.trgsw_lv1.alpha, tiny
    )
    g1 = trgsw.trgsw_encrypt_torus(
        jax.random.key(6), sk.lv1, jnp.uint32(1), tiny.trgsw_lv1.alpha, tiny
    )
    sel0 = trgsw.cmux(c1, c2, g0, tiny)
    sel1 = trgsw.cmux(c1, c2, g1, tiny)
    assert bool(jnp.all(trlwe.trlwe_decrypt_bool(sel0, sk.lv1) == m1))
    assert bool(jnp.all(trlwe.trlwe_decrypt_bool(sel1, sk.lv1) == m2))


def test_blind_rotate_roundtrip(tiny, sk, ck, rng):
    """blind_rotate + extract(0) round-trips a boolean
    (reference trgsw.rs:507-529)."""
    msgs = jnp.asarray(rng.integers(0, 2, BATCH).astype(bool))
    ct = tlwe.lwe_encrypt_bool(jax.random.key(7), sk.lv0, msgs, tiny.tlwe_lv0.alpha)
    acc = blind_rotate(ct, ck.testvec, ck.bsk, tiny)
    ext = sample_extract(acc, 0)
    dec = tlwe.lwe_decrypt_bool(ext, sk.lv1)
    assert bool(jnp.all(dec == msgs))


def test_identity_key_switching(tiny, sk, ck, rng):
    """lv1 -> lv0 key switch round-trips (reference trgsw.rs:531-546)."""
    msgs = jnp.asarray(rng.integers(0, 2, BATCH).astype(bool))
    ct1 = tlwe.lwe_encrypt_bool(jax.random.key(8), sk.lv1, msgs, tiny.tlwe_lv1.alpha)
    ct0 = identity_key_switch(ct1, ck.ksk_limbs, tiny)
    dec = tlwe.lwe_decrypt_bool(ct0, sk.lv0)
    assert bool(jnp.all(dec == msgs))
