"""Programmable (LUT) bootstrapping tests (reference bootstrap/lut.rs:142-274,
lut/encoder.rs:123-160, lut/generator.rs:272-356)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_tfhe_tpu import tlwe
from rs_tfhe_tpu.bootstrap import LutBootstrap
from rs_tfhe_tpu.lut import Encoder, Generator, div_round


def test_encoder_roundtrip():
    for m in [2, 4, 8, 16]:
        enc = Encoder(m)
        msgs = np.arange(m)
        assert np.array_equal(enc.decode(enc.encode(msgs)), msgs)
    enc = Encoder.with_scale(2, 0.5)
    assert enc.decode(enc.encode(1)) == 1
    assert not enc.decode_bool(enc.encode(0))


def test_div_round():
    assert div_round(5, 2) == 3
    assert div_round(4, 2) == 2
    assert div_round(3, 2) == 2
    assert div_round(1, 2) == 1
    assert div_round(0, 2) == 0


def test_generator_shapes(tiny):
    gen = Generator(2, tiny)
    lut = gen.generate_lookup_table(lambda x: x)
    assert lut.poly.shape == (2, tiny.n1)
    assert not lut.is_empty
    assert bool(jnp.all(lut.poly[0] == 0))  # trivial TRLWE: a = 0


def test_mod_switch(tiny):
    gen = Generator(2, tiny)
    for x in [0, 2**31, 2**32 - 1]:
        assert 0 <= gen.mod_switch(x) < gen.lookup_table_size


@pytest.mark.parametrize(
    "name,modulus,f",
    [
        ("identity", 2, lambda x: x),
        ("not", 2, lambda x: 1 - x),
        ("const1", 2, lambda x: 1),
        ("square_mod4", 4, lambda x: (x * x) % 4),
        ("incr_mod8", 8, lambda x: (x + 1) % 8),
    ],
)
def test_programmable_bootstrap(tiny, sk, ck, name, modulus, f):
    bs = LutBootstrap()
    msgs = jnp.asarray(np.arange(8) % modulus)
    ct = tlwe.lwe_encrypt_message(
        jax.random.key(200), sk.lv0, msgs, modulus, tiny.tlwe_lv0.alpha
    )
    out = bs.bootstrap_func(ct, f, modulus, ck)
    dec = tlwe.lwe_decrypt_message(out, sk.lv0, modulus)
    expected = np.array([f(int(m)) % modulus for m in np.asarray(msgs)])
    assert np.array_equal(dec, expected), name


def test_lut_reuse(tiny, sk, ck):
    """Precomputed LUT reused across inputs (reference lut.rs:226-254)."""
    bs = LutBootstrap()
    gen = Generator(2, tiny)
    lut = gen.generate_lookup_table(lambda x: 1 - x)
    msgs = jnp.asarray([0, 1, 1, 0, 1, 0, 0, 1])
    ct = tlwe.lwe_encrypt_message(
        jax.random.key(201), sk.lv0, msgs, 2, tiny.tlwe_lv0.alpha
    )
    out = bs.bootstrap_lut(ct, lut, ck)
    dec = tlwe.lwe_decrypt_message(out, sk.lv0, 2)
    assert np.array_equal(dec, 1 - np.asarray(msgs))


def test_lut_strategy_as_default_bootstrap(tiny, sk, ck):
    """LutBootstrap as a plain Bootstrap (identity over booleans,
    reference lut.rs:257-274)."""
    bs = LutBootstrap()
    assert bs.name == "lut"
    msgs = jnp.asarray([1, 0, 1, 0, 0, 1, 1, 0])
    ct = tlwe.lwe_encrypt_message(
        jax.random.key(202), sk.lv0, msgs, 2, tiny.tlwe_lv0.alpha
    )
    out = bs.bootstrap(ct, ck)
    dec = tlwe.lwe_decrypt_message(out, sk.lv0, 2)
    assert np.array_equal(dec, np.asarray(msgs))


def test_lookup_table_trlwe_conversions(tiny, sk, ck):
    """as_trlwe/from_trlwe parity (reference lut/lookup_table.rs:76-86):
    a LUT wraps a TRLWE ciphertext and converts both ways losslessly; an
    ENCRYPTED TRLWE round-trips through the LUT type and still decrypts."""
    import jax.numpy as jnp
    from rs_tfhe_tpu.lut.lookup_table import LookupTable
    from rs_tfhe_tpu import trlwe

    n = tiny.n1
    msg = jnp.asarray(np.random.default_rng(7).integers(0, 2, n).astype(bool))
    ct = trlwe.trlwe_encrypt_bool(
        jax.random.key(99), sk.lv1, msg, tiny.trlwe_lv1.alpha
    )
    lut = LookupTable.from_trlwe(ct)
    back = lut.as_trlwe()
    np.testing.assert_array_equal(np.asarray(back), np.asarray(ct))
    dec = trlwe.trlwe_decrypt_bool(back, sk.lv1)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(msg))
    # shape validation
    import pytest as _pytest
    with _pytest.raises(ValueError):
        LookupTable.from_trlwe(jnp.zeros((3, n), jnp.uint32))
