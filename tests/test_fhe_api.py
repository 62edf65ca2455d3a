"""High-level typed API (fhe.py): FheBool / FheUint / FheUintRadix.

The ergonomic layer over the gate/circuit/radix machinery — these tests pin
operator semantics (including plaintext coercion and batching) at TEST_TINY.
"""

import jax
import numpy as np
import pytest

from rs_tfhe_tpu import FheBool, FheInt, FheUint, FheUintRadix
from rs_tfhe_tpu.key import CloudKey, SecretKey

W = 4  # FheUint width — keeps the schoolbook multiply cheap at TEST_TINY


def test_fhe_bool_ops(sk, ck):
    a_pt = np.array([True, False, True, False])
    b_pt = np.array([True, True, False, False])
    a = FheBool.encrypt(jax.random.key(2), sk.lv0, a_pt, ck)
    b = FheBool.encrypt(jax.random.key(3), sk.lv0, b_pt, ck)

    np.testing.assert_array_equal((a & b).decrypt(sk.lv0), a_pt & b_pt)
    np.testing.assert_array_equal((a | b).decrypt(sk.lv0), a_pt | b_pt)
    np.testing.assert_array_equal((a ^ b).decrypt(sk.lv0), a_pt ^ b_pt)
    np.testing.assert_array_equal((~a).decrypt(sk.lv0), ~a_pt)
    # plaintext coercion, both sides
    np.testing.assert_array_equal((a & True).decrypt(sk.lv0), a_pt)
    np.testing.assert_array_equal((False | a).decrypt(sk.lv0), a_pt)


def test_fhe_bool_select(sk, ck):
    sel_pt = np.array([True, False])
    sel = FheBool.encrypt(jax.random.key(2), sk.lv0, sel_pt, ck)
    t = FheBool.encrypt(jax.random.key(3), sk.lv0, np.array([True, True]), ck)
    f = FheBool.encrypt(jax.random.key(4), sk.lv0, np.array([False, False]), ck)
    np.testing.assert_array_equal(
        sel.select(t, f).decrypt(sk.lv0), np.array([True, False])
    )


def test_fhe_uint_arith(sk, ck):
    x_pt = np.array([11, 3])
    y_pt = np.array([7, 13])
    x = FheUint.encrypt(jax.random.key(2), sk.lv0, x_pt, W, ck)
    y = FheUint.encrypt(jax.random.key(3), sk.lv0, y_pt, W, ck)

    np.testing.assert_array_equal((x + y).decrypt(sk.lv0), (x_pt + y_pt) % 16)
    np.testing.assert_array_equal((x - y).decrypt(sk.lv0), (x_pt - y_pt) % 16)
    np.testing.assert_array_equal((x * y).decrypt(sk.lv0), (x_pt * y_pt) % 16)
    # plaintext operand
    np.testing.assert_array_equal((x + 5).decrypt(sk.lv0), (x_pt + 5) % 16)


def test_fhe_uint_bitwise_shift(sk, ck):
    x_pt = np.array([0b1011, 0b0101])
    x = FheUint.encrypt(jax.random.key(2), sk.lv0, x_pt, W, ck)
    np.testing.assert_array_equal((x & 0b0110).decrypt(sk.lv0), x_pt & 0b0110)
    np.testing.assert_array_equal((x ^ 0b1111).decrypt(sk.lv0), x_pt ^ 0b1111)
    np.testing.assert_array_equal((~x).decrypt(sk.lv0), (~x_pt) % 16)
    np.testing.assert_array_equal((x << 1).decrypt(sk.lv0), (x_pt << 1) % 16)
    np.testing.assert_array_equal((x >> 2).decrypt(sk.lv0), x_pt >> 2)


def test_fhe_uint_comparisons(sk, ck):
    x_pt = np.array([9, 4, 7])
    y_pt = np.array([4, 9, 7])
    x = FheUint.encrypt(jax.random.key(2), sk.lv0, x_pt, W, ck)
    y = FheUint.encrypt(jax.random.key(3), sk.lv0, y_pt, W, ck)

    np.testing.assert_array_equal((x > y).decrypt(sk.lv0), x_pt > y_pt)
    np.testing.assert_array_equal((x < y).decrypt(sk.lv0), x_pt < y_pt)
    np.testing.assert_array_equal((x >= y).decrypt(sk.lv0), x_pt >= y_pt)
    np.testing.assert_array_equal((x <= y).decrypt(sk.lv0), x_pt <= y_pt)
    np.testing.assert_array_equal((x == y).decrypt(sk.lv0), x_pt == y_pt)
    np.testing.assert_array_equal((x != y).decrypt(sk.lv0), x_pt != y_pt)


def test_fhe_uint_divmod(sk, ck):
    x_pt = np.array([13, 9, 7])
    y_pt = np.array([3, 4, 0])  # includes division by encrypted zero
    x = FheUint.encrypt(jax.random.key(2), sk.lv0, x_pt, W, ck)
    y = FheUint.encrypt(jax.random.key(3), sk.lv0, y_pt, W, ck)
    q, r = x.divmod(y)
    # FHE convention for /0: quotient all-ones, remainder = numerator
    np.testing.assert_array_equal(q.decrypt(sk.lv0), np.array([4, 2, 15]))
    np.testing.assert_array_equal(r.decrypt(sk.lv0), np.array([1, 1, 7]))
    np.testing.assert_array_equal((x % 5).decrypt(sk.lv0), x_pt % 5)


def test_fhe_uint_select(sk, ck):
    sel = FheBool.encrypt(jax.random.key(2), sk.lv0, np.array([True, False]), ck)
    x = FheUint.encrypt(jax.random.key(3), sk.lv0, np.array([12, 12]), W, ck)
    y = FheUint.encrypt(jax.random.key(4), sk.lv0, np.array([5, 5]), W, ck)
    np.testing.assert_array_equal(
        sel.select(x, y).decrypt(sk.lv0), np.array([12, 5])
    )


def test_fhe_int_signed(sk, ck):
    x_pt = np.array([-3, 5, -8])  # W=4 signed range [-8, 7]
    y_pt = np.array([2, -6, 7])
    x = FheInt.encrypt(jax.random.key(2), sk.lv0, x_pt, W, ck)
    y = FheInt.encrypt(jax.random.key(3), sk.lv0, y_pt, W, ck)

    def wrap(v):  # two's complement wrap to [-8, 8)
        return (v + 8) % 16 - 8

    np.testing.assert_array_equal((x + y).decrypt(sk.lv0), wrap(x_pt + y_pt))
    np.testing.assert_array_equal((x - y).decrypt(sk.lv0), wrap(x_pt - y_pt))
    np.testing.assert_array_equal((x * y).decrypt(sk.lv0), wrap(x_pt * y_pt))
    # signed comparisons (MSB-flip trick)
    np.testing.assert_array_equal((x > y).decrypt(sk.lv0), x_pt > y_pt)
    np.testing.assert_array_equal((x < y).decrypt(sk.lv0), x_pt < y_pt)
    np.testing.assert_array_equal((x >= y).decrypt(sk.lv0), x_pt >= y_pt)
    # arithmetic right shift sign-extends
    np.testing.assert_array_equal((x >> 1).decrypt(sk.lv0), x_pt >> 1)
    np.testing.assert_array_equal(x.abs().decrypt(sk.lv0), wrap(np.abs(x_pt)))


def test_fhe_int_divmod(sk, ck):
    x_pt = np.array([-7, 7, -7])
    y_pt = np.array([2, -2, -2])
    x = FheInt.encrypt(jax.random.key(2), sk.lv0, x_pt, W, ck)
    y = FheInt.encrypt(jax.random.key(3), sk.lv0, y_pt, W, ck)
    q, r = x.divmod(y)
    # truncated-toward-zero (C semantics): -7/2 = -3 rem -1
    np.testing.assert_array_equal(q.decrypt(sk.lv0), np.array([-3, -3, 3]))
    np.testing.assert_array_equal(r.decrypt(sk.lv0), np.array([-1, 1, -1]))


def test_fhe_uint_radix(sk, ck):
    # base 2 digits at TEST_TINY (N=64 caps the LUT modulus at 8)
    base_bits, d = 2, 3
    x_pt = np.array([42, 17])
    y_pt = np.array([19, 33])
    x = FheUintRadix.encrypt(jax.random.key(2), sk.lv0, x_pt, d, ck, base_bits)
    y = FheUintRadix.encrypt(jax.random.key(3), sk.lv0, y_pt, d, ck, base_bits)

    np.testing.assert_array_equal((x + y).decrypt(sk.lv0), (x_pt + y_pt) % 64)
    np.testing.assert_array_equal((x + 9).decrypt(sk.lv0), (x_pt + 9) % 64)
    np.testing.assert_array_equal((x - y).decrypt(sk.lv0), (x_pt - y_pt) % 64)
    np.testing.assert_array_equal((5 - x).decrypt(sk.lv0), (5 - x_pt) % 64)
    # per-digit LUT map
    np.testing.assert_array_equal(
        x.apply(lambda v: (v * 3) % 4).decrypt(sk.lv0),
        np.array(
            [
                sum((((xx >> (2 * i)) & 3) * 3 % 4) << (2 * i) for i in range(d))
                for xx in x_pt
            ]
        ),
    )


def test_fhe_uint_radix_mul():
    """`*` on FheUintRadix: full-width ciphertext product. TEST_TINY's N=64
    cannot hold mul_radix's modulus-32 column margins (see test_mul_radix.py),
    so this runs the same dedicated N=512 tiny set."""
    from tests.test_mul_radix import MP

    sk = SecretKey.generate(jax.random.key(50), MP)
    ck = CloudKey.generate(jax.random.key(51), sk)
    x_pt, y_pt = np.array([14, 9]), np.array([13, 11])
    x = FheUintRadix.encrypt(jax.random.key(52), sk.lv0, x_pt, 2, ck, 2)
    y = FheUintRadix.encrypt(jax.random.key(53), sk.lv0, y_pt, 2, ck, 2)
    prod = x * y
    assert prod.num_digits == 4
    np.testing.assert_array_equal(prod.decrypt(sk.lv0), x_pt * y_pt)


def test_fhe_repr_and_width(sk, ck):
    x = FheUint.encrypt(jax.random.key(2), sk.lv0, 5, W, ck)
    assert x.width == W and "FheUint4" in repr(x)
    b = FheBool.encrypt(jax.random.key(3), sk.lv0, True, ck)
    assert "FheBool" in repr(b)


def test_fhebool_seeded_transport(sk, ck):
    """FheBool.encrypt_seeded / expand_seeded: compressed client->server
    wire format round-trips through a gate."""
    import numpy as np

    from rs_tfhe_tpu.fhe import FheBool

    vals = np.array([True, False, True, True])
    seed, bodies = FheBool.encrypt_seeded(
        jax.random.key(9), sk.lv0, vals, sk.params)
    x = FheBool.expand_seeded(seed, bodies, ck)
    np.testing.assert_array_equal(x.decrypt(sk.lv0), vals)
    np.testing.assert_array_equal((~x).decrypt(sk.lv0), ~vals)


def test_fhe_uint_radix_seeded_transport(sk, ck):
    """FheUintRadix.encrypt_seeded / expand_seeded: 1 word/digit wire format
    round-trips through radix arithmetic (server-side add on expanded cts)."""
    base_bits, d = 2, 3
    x_pt = np.array([42, 17])
    y_pt = np.array([19, 33])
    seed_x, bodies_x = FheUintRadix.encrypt_seeded(
        jax.random.key(7), sk.lv0, x_pt, d, sk.params, base_bits)
    assert bodies_x.shape == (2, d)  # the whole wire payload (+2-word seed)
    x = FheUintRadix.expand_seeded(seed_x, bodies_x, ck, base_bits)
    np.testing.assert_array_equal(x.decrypt(sk.lv0), x_pt)
    y = FheUintRadix.encrypt(jax.random.key(8), sk.lv0, y_pt, d, ck, base_bits)
    np.testing.assert_array_equal((x + y).decrypt(sk.lv0), (x_pt + y_pt) % 64)
