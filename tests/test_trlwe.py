"""TRLWE round-trip and sample-extraction tests (reference trlwe.rs:146-230)."""

import jax
import jax.numpy as jnp
import numpy as np

from rs_tfhe_tpu import tlwe, trlwe
from rs_tfhe_tpu.ops.extract import sample_extract

from conftest import BATCH


def test_trlwe_roundtrip(tiny, sk, sk_dirty, rng):
    msgs = jnp.asarray(rng.integers(0, 2, (BATCH, tiny.n1)).astype(bool))
    ct = trlwe.trlwe_encrypt_bool(jax.random.key(0), sk.lv1, msgs, tiny.trlwe_lv1.alpha)
    dec = trlwe.trlwe_decrypt_bool(ct, sk.lv1)
    assert bool(jnp.all(dec == msgs))
    dec_dirty = np.asarray(trlwe.trlwe_decrypt_bool(ct, sk_dirty.lv1))
    frac = np.mean(dec_dirty != np.asarray(msgs))
    assert 0.25 < frac < 0.75


def test_sample_extract(tiny, sk, rng):
    msgs = jnp.asarray(rng.integers(0, 2, (BATCH, tiny.n1)).astype(bool))
    ct = trlwe.trlwe_encrypt_bool(jax.random.key(1), sk.lv1, msgs, tiny.trlwe_lv1.alpha)
    for k in [0, 1, tiny.n1 - 1]:
        ext = sample_extract(ct, k)
        dec = tlwe.lwe_decrypt_bool(ext, sk.lv1)
        assert bool(jnp.all(dec == msgs[:, k])), f"k={k}"
