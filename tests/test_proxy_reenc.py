"""Proxy re-encryption tests (reference proxy_reenc.rs:519-702)."""

import jax
import jax.numpy as jnp
import numpy as np

from rs_tfhe_tpu import proxy_reenc, tlwe
from rs_tfhe_tpu.key import SecretKey
from rs_tfhe_tpu.proxy_reenc import PublicKeyLv0

from conftest import BATCH


def _bools(rng, n=BATCH):
    return jnp.asarray(rng.integers(0, 2, n).astype(bool))


def test_public_key_encryption(tiny, sk, rng):
    pk = PublicKeyLv0.generate(jax.random.key(300), sk.lv0, tiny)
    msgs = _bools(rng)
    ct = pk.encrypt_bool(jax.random.key(301), msgs, tiny.tlwe_lv0.alpha)
    dec = tlwe.lwe_decrypt_bool(ct, sk.lv0)
    assert bool(jnp.all(dec == msgs))


def test_reencryption_symmetric(tiny, sk, sk_dirty, rng):
    rk = proxy_reenc.new_symmetric(
        jax.random.key(302), sk.lv0, sk_dirty.lv0, tiny
    )
    msgs = _bools(rng)
    alice_ct = tlwe.lwe_encrypt_bool(
        jax.random.key(303), sk.lv0, msgs, tiny.tlwe_lv0.alpha
    )
    bob_ct = proxy_reenc.reencrypt(alice_ct, rk)
    assert bool(jnp.all(tlwe.lwe_decrypt_bool(bob_ct, sk_dirty.lv0) == msgs))


def test_reencryption_asymmetric(tiny, sk, sk_dirty, rng):
    bob_pk = PublicKeyLv0.generate(jax.random.key(304), sk_dirty.lv0, tiny)
    rk = proxy_reenc.new_asymmetric(jax.random.key(305), sk.lv0, bob_pk, tiny)
    msgs = _bools(rng)
    alice_ct = tlwe.lwe_encrypt_bool(
        jax.random.key(306), sk.lv0, msgs, tiny.tlwe_lv0.alpha
    )
    bob_ct = proxy_reenc.reencrypt(alice_ct, rk)
    assert bool(jnp.all(tlwe.lwe_decrypt_bool(bob_ct, sk_dirty.lv0) == msgs))


def test_reencryption_chain(tiny, rng):
    """Alice -> Bob -> Carol two-hop chain (reference proxy_reenc.rs:657-680)."""
    ka, kb, kc = (SecretKey.generate(jax.random.key(s), tiny) for s in (1, 2, 3))
    bob_pk = PublicKeyLv0.generate(jax.random.key(310), kb.lv0, tiny)
    carol_pk = PublicKeyLv0.generate(jax.random.key(311), kc.lv0, tiny)
    rk_ab = proxy_reenc.new_asymmetric(jax.random.key(312), ka.lv0, bob_pk, tiny)
    rk_bc = proxy_reenc.new_asymmetric(jax.random.key(313), kb.lv0, carol_pk, tiny)
    msgs = _bools(rng)
    ct_a = tlwe.lwe_encrypt_bool(jax.random.key(314), ka.lv0, msgs, tiny.tlwe_lv0.alpha)
    ct_b = proxy_reenc.reencrypt(ct_a, rk_ab)
    assert bool(jnp.all(tlwe.lwe_decrypt_bool(ct_b, kb.lv0) == msgs))
    ct_c = proxy_reenc.reencrypt(ct_b, rk_bc)
    assert bool(jnp.all(tlwe.lwe_decrypt_bool(ct_c, kc.lv0) == msgs))


def test_key_shapes(tiny, sk, sk_dirty):
    """Key-shape assertions (reference proxy_reenc.rs:638-655)."""
    rk = proxy_reenc.new_symmetric(jax.random.key(320), sk.lv0, sk_dirty.lv0, tiny)
    g = tiny.trgsw_lv1
    assert rk.base == 1 << g.basebit
    assert rk.t == g.iks_t
    from rs_tfhe_tpu.torus import lane_pad
    assert rk.table_limbs.shape == (
        tiny.n0 * g.iks_t * rk.base, 4 * lane_pad(tiny.n0 + 1)
    )


def test_custom_params(tiny, sk, sk_dirty, rng):
    rk = proxy_reenc.new_symmetric(
        jax.random.key(321), sk.lv0, sk_dirty.lv0, tiny,
        alpha=tiny.ksk_alpha * 0.8, basebit=3, t=6,
    )
    msgs = _bools(rng)
    ct = tlwe.lwe_encrypt_bool(jax.random.key(322), sk.lv0, msgs, tiny.tlwe_lv0.alpha)
    out = proxy_reenc.reencrypt(ct, rk)
    assert bool(jnp.all(tlwe.lwe_decrypt_bool(out, sk_dirty.lv0) == msgs))


def test_reencryption_accuracy_large_sample(tiny, sk, sk_dirty, rng):
    """Reference parity scale-up: its accuracy tests run 100 trials at
    >90-95% (proxy_reenc.rs:532-555, :606-636); batched encryption makes
    4096 trials free here, and TEST_TINY margins support asserting 100%."""
    rk = proxy_reenc.new_symmetric(jax.random.key(310), sk.lv0, sk_dirty.lv0, tiny)
    msgs = _bools(rng, 4096)
    ct = tlwe.lwe_encrypt_bool(jax.random.key(311), sk.lv0, msgs, tiny.tlwe_lv0.alpha)
    bob = proxy_reenc.reencrypt(ct, rk)
    dec = np.asarray(tlwe.lwe_decrypt_bool(bob, sk_dirty.lv0))
    assert (dec == np.asarray(msgs)).all()

    bob_pk = PublicKeyLv0.generate(jax.random.key(312), sk_dirty.lv0, tiny)
    rka = proxy_reenc.new_asymmetric(jax.random.key(313), sk.lv0, bob_pk, tiny)
    bob2 = proxy_reenc.reencrypt(ct, rka)
    dec2 = np.asarray(tlwe.lwe_decrypt_bool(bob2, sk_dirty.lv0))
    assert (dec2 == np.asarray(msgs)).all()
