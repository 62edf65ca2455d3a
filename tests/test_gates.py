"""Truth-table tests for the full gate set (reference gates.rs:558-681).

All four input combinations are packed into one batch so each gate compiles
and bootstraps exactly once.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_tfhe_tpu import gates, tlwe
from rs_tfhe_tpu.bootstrap import VanillaBootstrap

A = np.array([False, False, True, True])
B = np.array([False, True, False, True])

GATE_TABLE = {
    "nand": ~(A & B),
    "or": A | B,
    "and": A & B,
    "xor": A ^ B,
    "xnor": ~(A ^ B),
    "nor": ~(A | B),
    "and_ny": ~A & B,
    "and_yn": A & ~B,
    "or_ny": ~A | B,
    "or_yn": A | ~B,
}


@pytest.fixture(scope="module")
def enc_inputs(tiny, sk):
    cta = tlwe.lwe_encrypt_bool(
        jax.random.key(100), sk.lv0, jnp.asarray(A), tiny.tlwe_lv0.alpha
    )
    ctb = tlwe.lwe_encrypt_bool(
        jax.random.key(101), sk.lv0, jnp.asarray(B), tiny.tlwe_lv0.alpha
    )
    return cta, ctb


@pytest.mark.parametrize("name", sorted(GATE_TABLE))
def test_gate_truth_table(name, enc_inputs, sk, ck):
    cta, ctb = enc_inputs
    out = gates.batch_gate(name, cta, ctb, ck)
    dec = np.asarray(tlwe.lwe_decrypt_bool(out, sk.lv0))
    assert np.array_equal(dec, GATE_TABLE[name]), name


def test_mux(tiny, enc_inputs, sk, ck, rng):
    cta, ctb = enc_inputs
    c = np.array([True, False, True, False])
    ctc = tlwe.lwe_encrypt_bool(
        jax.random.key(102), sk.lv0, jnp.asarray(c), tiny.tlwe_lv0.alpha
    )
    out = gates.mux(cta, ctb, ctc, ck)
    dec = np.asarray(tlwe.lwe_decrypt_bool(out, sk.lv0))
    assert np.array_equal(dec, np.where(A, B, c))


def test_mux_naive(tiny, enc_inputs, sk, ck):
    cta, ctb = enc_inputs
    c = np.array([False, True, True, False])
    ctc = tlwe.lwe_encrypt_bool(
        jax.random.key(103), sk.lv0, jnp.asarray(c), tiny.tlwe_lv0.alpha
    )
    out = gates.mux_naive(cta, ctb, ctc, ck)
    dec = np.asarray(tlwe.lwe_decrypt_bool(out, sk.lv0))
    assert np.array_equal(dec, np.where(A, B, c))


def test_not_copy_constant(tiny, enc_inputs, sk, ck):
    cta, _ = enc_inputs
    dec_not = np.asarray(tlwe.lwe_decrypt_bool(gates.not_(cta), sk.lv0))
    assert np.array_equal(dec_not, ~A)
    dec_copy = np.asarray(tlwe.lwe_decrypt_bool(gates.copy(cta), sk.lv0))
    assert np.array_equal(dec_copy, A)
    const = gates.constant(jnp.asarray(A), 4, tiny)
    dec_const = np.asarray(tlwe.lwe_decrypt_bool(const, sk.lv0))
    assert np.array_equal(dec_const, A)


def test_gates_class_with_strategy(enc_inputs, sk, ck):
    """Strategy injection (reference gates.rs:785-805)."""
    cta, ctb = enc_inputs
    g = gates.Gates(strategy=VanillaBootstrap())
    assert g.bootstrap_strategy == "vanilla"
    out = g.nand(cta, ctb, ck)
    dec = np.asarray(tlwe.lwe_decrypt_bool(out, sk.lv0))
    assert np.array_equal(dec, ~(A & B))


def test_lut_strategy_gates_statistically_correct(sk, ck, rng):
    """Regression: the reference's identity-LUT-mod-2 gate bootstrap puts
    boolean gate phases exactly on LUT range boundaries (only ~50-80%
    correct). Our LutBootstrap gates use the sign test vector and must be
    100% correct over many random inputs."""
    import jax
    import jax.numpy as jnp
    from rs_tfhe_tpu.bootstrap import LutBootstrap
    from rs_tfhe_tpu.gates import Gates

    g = Gates(LutBootstrap())
    bits_a = rng.integers(0, 2, 64).astype(bool)
    bits_b = rng.integers(0, 2, 64).astype(bool)
    ka, kb = jax.random.split(jax.random.key(31))
    a = tlwe.lwe_encrypt_bool(ka, sk.lv0, jnp.asarray(bits_a), sk.params.tlwe_lv0.alpha)
    b = tlwe.lwe_encrypt_bool(kb, sk.lv0, jnp.asarray(bits_b), sk.params.tlwe_lv0.alpha)
    for name, fn in [("or_", lambda x, y: x | y), ("and_", lambda x, y: x & y),
                     ("xor", lambda x, y: x ^ y)]:
        out = getattr(g, name)(a, b, ck)
        dec = np.asarray(tlwe.lwe_decrypt_bool(out, sk.lv0))
        np.testing.assert_array_equal(dec, fn(bits_a, bits_b), err_msg=name)
    # strategy-routed MUX with the lv1 composition contract
    c_bits = rng.integers(0, 2, 64).astype(bool)
    c = tlwe.lwe_encrypt_bool(jax.random.key(32), sk.lv0, jnp.asarray(c_bits),
                              sk.params.tlwe_lv0.alpha)
    out = g.mux(a, b, c, ck)
    dec = np.asarray(tlwe.lwe_decrypt_bool(out, sk.lv0))
    np.testing.assert_array_equal(dec, np.where(bits_a, bits_b, c_bits))
