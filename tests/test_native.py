"""Native C++ client runtime vs the JAX path (csrc/tfhe_client.cpp).

The native library re-implements client-side torus math; these tests pin it
bit-for-bit against the JAX implementations (both are exact integer
arithmetic, so equality is exact, not approximate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_tfhe_tpu import native
from rs_tfhe_tpu.ops.poly import monomial_rotate as jax_monomial_rotate
from rs_tfhe_tpu.ops.poly import schoolbook_negacyclic
from rs_tfhe_tpu.tlwe import lwe_decrypt_bool, lwe_phase

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def test_polymul_matches_oracle(rng):
    n = 64
    a = rng.integers(0, 1 << 32, n, dtype=np.uint32)
    b = rng.integers(0, 1 << 32, n, dtype=np.uint32)
    got = native.negacyclic_polymul(a, b)
    np.testing.assert_array_equal(got, schoolbook_negacyclic(a, b))


def test_monomial_rotate_matches_jax(rng):
    n = 64
    t = rng.integers(0, 1 << 32, n, dtype=np.uint32)
    for k in [0, 1, 5, n - 1, n, n + 3, 2 * n - 1]:
        got = native.monomial_rotate(t, k)
        exp = np.asarray(
            jax_monomial_rotate(jnp.asarray(t)[None], jnp.asarray([k]))
        )[0]
        np.testing.assert_array_equal(got, exp, err_msg=f"k={k}")


def test_native_encrypt_jax_decrypt(sk):
    """Ciphertexts made by the C++ client decrypt correctly in JAX."""
    mu_true = np.uint32(1 << 29)  # 1/8
    mu_false = np.uint32(((1 << 32) - (1 << 29)) & 0xFFFFFFFF)  # -1/8
    msgs = np.array([True, False, True, True, False])
    mu = np.where(msgs, mu_true, mu_false).astype(np.uint32)
    s = np.asarray(sk.lv0)
    ct = native.lwe_encrypt(12345, s, mu, sk.params.tlwe_lv0.alpha)
    dec = np.asarray(lwe_decrypt_bool(jnp.asarray(ct), sk.lv0))
    np.testing.assert_array_equal(dec, msgs)
    # and the native decryptor agrees
    np.testing.assert_array_equal(native.lwe_decrypt_bool(ct, s), msgs)


def test_native_phase_matches_jax(sk, rng):
    n = sk.params.n0
    ct = rng.integers(0, 1 << 32, (4, n + 1), dtype=np.uint32)
    got = native.lwe_phase(ct, np.asarray(sk.lv0))
    exp = np.asarray(lwe_phase(jnp.asarray(ct), sk.lv0))
    np.testing.assert_array_equal(got, exp)


def test_native_decompose_matches_jax(tiny, rng):
    from rs_tfhe_tpu.ops.decompose import gadget_decompose

    g = tiny.trgsw_lv1
    x = rng.integers(0, 1 << 32, (3, 2, tiny.n1), dtype=np.uint32)
    # native takes the combined offset (balance + rounding half-bit)
    got = native.gadget_decompose(
        x, g.l, g.bgbit,
        tiny.decomposition_offset + tiny.decomposition_round_bit,
    )
    exp = np.asarray(gadget_decompose(jnp.asarray(x), tiny))  # [3, 2L, N]
    # native layout: [l, 3, 2, N]; jax layout: [3, 2L, N] with a-digits then
    # b-digits interleaved as [2, L] -> compare per (poly, digit)
    exp2 = exp.reshape(3, 2, g.l, tiny.n1)
    for d in range(g.l):
        np.testing.assert_array_equal(got[d], exp2[:, :, d])


def test_native_key_switch_matches_jax(sk, ck, rng):
    """Native lv1->lv0 key switch == the JAX one-hot-matmul key switch."""
    from rs_tfhe_tpu.ops.keyswitch import identity_key_switch as jax_ks
    from rs_tfhe_tpu.tlwe import lwe_encrypt_bool

    p = sk.params
    g = p.trgsw_lv1
    # regenerate the raw (u32) KSK rows with the same derivation as CloudKey
    ct = lwe_encrypt_bool(
        jax.random.key(8), sk.lv1, jnp.asarray([True]), p.tlwe_lv1.alpha
    )[0]
    jax_out = np.asarray(jax_ks(jnp.asarray(ct)[None], ck.ksk_limbs, p))[0]

    # reconstruct u32 KSK from the stored limbs (exact: limbs are a
    # bijection; planar-padded layout [rows, 4*P], column q*P + c)
    pw = ck.ksk_limbs.shape[1] // 4
    limbs = np.asarray(ck.ksk_limbs, dtype=np.int64).reshape(
        p.n1 * g.iks_t * (1 << g.basebit), 4, pw
    )[:, :, : p.n0 + 1]
    ksk_u32 = np.zeros((limbs.shape[0], p.n0 + 1), dtype=np.uint32)
    for q in range(4):
        ksk_u32 += (limbs[:, q, :].astype(np.uint32)) << (8 * q)
    ksk_u32 = ksk_u32.reshape(p.n1, g.iks_t, 1 << g.basebit, p.n0 + 1)

    got = native.identity_key_switch(np.asarray(ct), ksk_u32, p.n0, g.iks_t, g.basebit)
    np.testing.assert_array_equal(got, jax_out)


def test_native_trlwe_encrypt_phase_roundtrip(sk, rng):
    """Native TRLWE encryption decrypts in JAX (and native phase agrees
    bit-for-bit with the JAX phase on the same ciphertext)."""
    from rs_tfhe_tpu.trlwe import trlwe_phase

    n = sk.params.n1
    mu = ((rng.integers(0, 2, (3, n), dtype=np.uint32)) << np.uint32(29))
    s1 = np.asarray(sk.lv1)
    ct = native.trlwe_encrypt(99, s1, mu, sk.params.trlwe_lv1.alpha)
    ph_jax = np.asarray(trlwe_phase(jnp.asarray(ct), sk.lv1))
    ph_nat = native.trlwe_phase(ct, s1)
    np.testing.assert_array_equal(ph_nat, ph_jax)
    # message recovered: round phase to the nearest multiple of 1/8
    got = ((ph_jax.astype(np.int64) + (1 << 28)) >> 29) & 7
    np.testing.assert_array_equal(got, (mu >> np.uint32(29)) & 7)


def test_native_sample_extract_matches_jax(rng):
    from rs_tfhe_tpu.ops.extract import sample_extract

    n = 64
    ct = rng.integers(0, 1 << 32, (2, n), dtype=np.uint32)
    for k in [0, 1, n // 2, n - 1]:
        got = native.trlwe_sample_extract(ct, k)
        exp = np.asarray(sample_extract(jnp.asarray(ct), k))
        np.testing.assert_array_equal(got, exp, err_msg=f"k={k}")


def test_native_message_encrypt_decrypt(sk):
    from rs_tfhe_tpu.tlwe import lwe_decrypt_message

    m_mod = 8
    msgs = np.array([0, 1, 5, 7, 3, 2], dtype=np.uint32)
    s = np.asarray(sk.lv0)
    ct = native.lwe_encrypt_message(
        77, s, msgs, m_mod, sk.params.tlwe_lv0.alpha
    )
    # JAX decryptor agrees with the native one, and both recover the message
    np.testing.assert_array_equal(
        np.asarray(lwe_decrypt_message(jnp.asarray(ct), sk.lv0, m_mod)), msgs
    )
    np.testing.assert_array_equal(native.lwe_decrypt_message(ct, s, m_mod), msgs)


def test_native_threefry_matches_jax():
    """The C++ threefry stream is bit-identical to torus.threefry2x32_bits
    (which is itself pinned to jax.random.bits in test_tlwe)."""
    from rs_tfhe_tpu.torus import threefry2x32_bits_raw

    k1, k2, start, count = 0xDEADBEEF, 0x12345678, 1000, 257
    got = native.threefry_bits(k1, k2, start, count)
    exp = np.asarray(threefry2x32_bits_raw(
        jnp.uint32(k1), jnp.uint32(k2), start, count))
    np.testing.assert_array_equal(got, exp)


def test_seeded_ciphertexts_cross_runtime(sk, rng):
    """Seeded (compressed) ciphertexts: JAX-encrypted seeds expand to the
    SAME full ciphertexts in the native client, and native-encrypted
    bodies decrypt in JAX after either side expands."""
    from rs_tfhe_tpu.tlwe import (
        lwe_decrypt_bool,
        lwe_encrypt_bool_seeded,
        lwe_expand_seeded,
    )

    p, s = sk.params, np.asarray(sk.lv0)
    msgs = rng.integers(0, 2, 16).astype(bool)

    # JAX encrypt -> expand on both runtimes -> identical, and decrypts
    seed, bodies = lwe_encrypt_bool_seeded(
        jax.random.key(5), sk.lv0, jnp.asarray(msgs), p.tlwe_lv0.alpha)
    full_jax = np.asarray(lwe_expand_seeded(seed, bodies, p.n0))
    full_nat = native.lwe_expand_seeded(np.asarray(seed), np.asarray(bodies), p.n0)
    np.testing.assert_array_equal(full_jax, full_nat)
    np.testing.assert_array_equal(
        np.asarray(lwe_decrypt_bool(jnp.asarray(full_jax), sk.lv0)), msgs)

    # native seeded encrypt -> JAX expand -> decrypts
    mu_true = np.uint32(1 << 29)
    mu_false = np.uint32((1 << 32) - (1 << 29))
    mu = np.where(msgs, mu_true, mu_false).astype(np.uint32)
    seed2 = np.array([0xAB12, 0xCD34], dtype=np.uint32)
    bodies2 = native.lwe_encrypt_seeded(seed2, 777, s, mu, p.tlwe_lv0.alpha)
    full2 = np.asarray(lwe_expand_seeded(
        jnp.asarray(seed2), jnp.asarray(bodies2), p.n0))
    np.testing.assert_array_equal(
        np.asarray(lwe_decrypt_bool(jnp.asarray(full2), sk.lv0)), msgs)


def test_native_radix_client_jax_server(sk, ck):
    """A pure-C++ client composes radix-integer ciphertexts from
    lwe_encrypt_message digits; the JAX server adds them homomorphically
    and the client decodes the digits back (base 2 at TEST_TINY)."""
    from rs_tfhe_tpu import models

    base_bits, num_digits, m_mod = 2, 2, 8
    s = np.asarray(sk.lv0)
    xs = np.array([3, 7, 12, 15], dtype=np.uint32)
    ys = np.array([5, 9, 3, 15], dtype=np.uint32)

    def enc(vals, seed):
        digits = np.stack(
            [(vals >> (base_bits * i)) & 3 for i in range(num_digits)], -1
        ).astype(np.uint32)
        flat = native.lwe_encrypt_message(
            seed, s, digits.ravel(), m_mod, sk.params.tlwe_lv0.alpha
        )
        return jnp.asarray(flat.reshape(*digits.shape, -1))

    out = models.add_radix(enc(xs, 31), enc(ys, 32), ck, base_bits)
    digits = native.lwe_decrypt_message(
        np.asarray(out).reshape(-1, sk.params.n0 + 1), s, m_mod
    ).reshape(4, num_digits)
    got = (digits[:, 0] & 3) | ((digits[:, 1] & 3) << 2)
    np.testing.assert_array_equal(got, (xs + ys) % 16)


def test_native_seeded_radix_client_jax_server(sk, ck):
    """Compressed radix wire, cross-runtime: a pure-C++ client seeded-encrypts
    digit messages (1 word/digit + 2-word seed), the JAX server expands with
    models.arithmetic.expand_radix_seeded and adds homomorphically."""
    from rs_tfhe_tpu import models
    from rs_tfhe_tpu.models.arithmetic import expand_radix_seeded
    from rs_tfhe_tpu.torus import f64_to_torus

    base_bits, num_digits, m_mod = 2, 2, 8
    p, s = sk.params, np.asarray(sk.lv0)
    xs = np.array([3, 7, 12, 15], dtype=np.uint32)
    ys = np.array([5, 9, 3, 15], dtype=np.uint32)
    scale = np.uint32(f64_to_torus(1.0 / (2.0 * m_mod)))

    def enc_seeded(vals, k1, k2, nonce):
        digits = np.stack(
            [(vals >> (base_bits * i)) & 3 for i in range(num_digits)], -1
        ).astype(np.uint32)
        seed = np.array([k1, k2], dtype=np.uint32)
        mu = (digits.ravel() * scale).astype(np.uint32)
        bodies = native.lwe_encrypt_seeded(seed, nonce, s, mu, p.tlwe_lv0.alpha)
        return expand_radix_seeded(
            jnp.asarray(seed), jnp.asarray(bodies.reshape(digits.shape)), p.n0
        )

    out = models.add_radix(
        enc_seeded(xs, 0x11, 0x22, 41), enc_seeded(ys, 0x33, 0x44, 42),
        ck, base_bits,
    )
    digits = native.lwe_decrypt_message(
        np.asarray(out).reshape(-1, p.n0 + 1), s, m_mod
    ).reshape(4, num_digits)
    got = (digits[:, 0] & 3) | ((digits[:, 1] & 3) << 2)
    np.testing.assert_array_equal(got, (xs + ys) % 16)
