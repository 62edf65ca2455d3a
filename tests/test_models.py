"""Circuit/arithmetic model tests (TEST_TINY parameters, CPU mesh).

Mirrors the reference's example-based integration tests
(rs-tfhe examples/add_two_numbers.rs, lut_add_two_numbers.rs, run in CI:
.github/workflows/ci.yml:74-81)."""

import jax
import numpy as np

from rs_tfhe_tpu import models
from rs_tfhe_tpu.bit_utils import decrypt_uint, encrypt_uint, from_bits
from rs_tfhe_tpu.tlwe import lwe_decrypt_bool


W = 8


def _enc(sk, val, key_seed):
    return encrypt_uint(
        jax.random.key(key_seed), sk.lv0, val, W, sk.params.tlwe_lv0.alpha
    )


def test_kogge_stone_add(sk, ck):
    for x, y in [(42, 77), (200, 56), (255, 1), (0, 0), (123, 205)]:
        a, b = _enc(sk, x, 2), _enc(sk, y, 3)
        out = models.add_kogge_stone(a, b, ck)
        assert decrypt_uint(out, sk.lv0) == (x + y) % 256, (x, y)


def test_ripple_carry_add(sk, ck):
    a, b = _enc(sk, 137, 2), _enc(sk, 119, 3)
    out = models.add_ripple_carry(a, b, ck)
    assert decrypt_uint(out, sk.lv0) == (137 + 119) % 256


def test_sub(sk, ck):
    for x, y in [(200, 56), (5, 9), (0, 1)]:
        a, b = _enc(sk, x, 2), _enc(sk, y, 3)
        out = models.sub(a, b, ck)
        assert decrypt_uint(out, sk.lv0) == (x - y) % 256, (x, y)


def test_equals(sk, ck):
    a, b, c = _enc(sk, 99, 2), _enc(sk, 99, 3), _enc(sk, 98, 4)
    assert bool(lwe_decrypt_bool(models.equals(a, b, ck), sk.lv0))
    assert not bool(lwe_decrypt_bool(models.equals(a, c, ck), sk.lv0))


def test_greater_than(sk, ck):
    for x, y in [(100, 50), (50, 100), (77, 77)]:
        a, b = _enc(sk, x, 2), _enc(sk, y, 3)
        got = bool(lwe_decrypt_bool(models.greater_than(a, b, ck), sk.lv0))
        assert got == (x > y), (x, y)


def test_batched_adds(sk, ck):
    """Leading batch dim: 4 independent additions in one gate batch."""
    xs = np.array([12, 250, 99, 0])
    ys = np.array([34, 30, 99, 255])
    a = np.stack([np.asarray(_enc(sk, int(x), 2)) for x in xs])
    b = np.stack([np.asarray(_enc(sk, int(y), 3)) for y in ys])
    out = models.add_kogge_stone(jax.numpy.asarray(a), jax.numpy.asarray(b), ck)
    bits = np.asarray(lwe_decrypt_bool(out, sk.lv0))
    got = np.array([from_bits(bits[i]) for i in range(4)])
    np.testing.assert_array_equal(got, (xs + ys) % 256)


# ---------------------------------------------------------------------------
# Radix (LUT) arithmetic — base 2 at TEST_TINY (N=64 limits the modulus)
# ---------------------------------------------------------------------------

BASE_BITS = 2  # modulus 8 fits TEST_TINY's N=64 table comfortably


def test_radix_roundtrip(sk):
    vals = np.array([0, 5, 11, 15])
    ct = models.encrypt_radix(jax.random.key(5), sk.lv0, vals, 2, sk.params, BASE_BITS)
    got = models.decrypt_radix(ct, sk.lv0, BASE_BITS)
    np.testing.assert_array_equal(got, vals)


def test_radix_add(sk, ck):
    xs = np.array([3, 7, 12, 15])
    ys = np.array([5, 9, 3, 15])
    a = models.encrypt_radix(jax.random.key(5), sk.lv0, xs, 2, sk.params, BASE_BITS)
    b = models.encrypt_radix(jax.random.key(6), sk.lv0, ys, 2, sk.params, BASE_BITS)
    out = models.add_radix(a, b, ck, BASE_BITS)
    got = models.decrypt_radix(out, sk.lv0, BASE_BITS)
    np.testing.assert_array_equal(got, (xs + ys) % 16)


def test_apply_lut_radix(sk, ck):
    vals = np.array([0, 1, 2, 3])
    ct = models.encrypt_radix(jax.random.key(5), sk.lv0, vals, 1, sk.params, BASE_BITS)
    out = models.apply_lut_radix(ct, lambda x: (x * x) % 8, ck, BASE_BITS)
    got = np.asarray(
        models.decrypt_radix(out, sk.lv0, BASE_BITS)
    )  # low 2 bits of x^2 mod 8
    np.testing.assert_array_equal(got & 3, np.array([(v * v) % 8 for v in vals]) & 3)


def test_mul_csa(sk, ck):
    """Carry-save multiplier (circuits.mul_csa): W=5 exercises odd leftover
    rows in the 3:2 reduction tree; values wrap mod 2^W."""
    import jax.numpy as jnp
    from rs_tfhe_tpu.bit_utils import encrypt_uint as enc

    w = 5
    for x, y in [(21, 19), (0, 31), (31, 31), (7, 9)]:
        a = enc(jax.random.key(60), sk.lv0, x, w, sk.params.tlwe_lv0.alpha)
        b = enc(jax.random.key(61), sk.lv0, y, w, sk.params.tlwe_lv0.alpha)
        out = models.mul_csa(a, b, ck)
        assert out.shape[-2] == w
        assert decrypt_uint(out, sk.lv0) == (x * y) % (1 << w), (x, y)
