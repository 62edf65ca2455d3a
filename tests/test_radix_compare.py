"""Radix comparisons, select, min/max (models.arithmetic.compare_radix &
friends) — capabilities beyond the reference (its comparisons exist only as
boolean bit circuits; there is no encrypted select over LUT-encoded digits).

Same dedicated N=512 tiny set as test_mul_radix: TEST_TINY's N=64 ring
cannot hold the modulus-16 combine-stage margins. Production margins are
documented in arithmetic.compare_radix (certified wherever add_radix is).
"""

import jax
import numpy as np
import pytest

from rs_tfhe_tpu.fhe import FheBool, FheUintRadix
from rs_tfhe_tpu.key import CloudKey, SecretKey
from rs_tfhe_tpu.models.arithmetic import (
    compare_radix,
    decrypt_radix,
    encrypt_radix,
    max_radix,
    min_radix,
    select_radix,
)
from rs_tfhe_tpu.params import TfheParams, TlweParams, TrgswParams, TrlweParams
from rs_tfhe_tpu.tlwe import lwe_decrypt_bool, lwe_encrypt_bool

MP = TfheParams(
    security_bits=0,
    description="insecure tiny set with modulus-32 LUT margins (N=512)",
    tlwe_lv0=TlweParams(n=16, alpha=1.0e-9),
    tlwe_lv1=TlweParams(n=512, alpha=1.0e-12),
    trlwe_lv1=TrlweParams(n=512, alpha=1.0e-12),
    trgsw_lv1=TrgswParams(n=512, nbit=9, bgbit=6, l=3, basebit=2, iks_t=8,
                          alpha=1.0e-12),
)


@pytest.fixture(scope="module")
def mkeys():
    sk = SecretKey.generate(jax.random.key(60), MP)
    ck = CloudKey.generate(jax.random.key(61), sk)
    return sk, ck


def _dec_bool(ct, sk):
    return np.asarray(jax.device_get(lwe_decrypt_bool(ct, sk.lv0)))


@pytest.mark.parametrize("d", [1, 2, 5])
def test_compare_radix_tree_depths(mkeys, rng, d):
    """Every tree shape class: D=1 (single PBS), D=2 (one even round),
    D=5 (multi-round with odd leftovers at both levels — subsumes the
    D=3/D=4 shapes, which were dropped to keep single-core CI time down)."""
    sk, ck = mkeys
    hi = 1 << (3 * d)
    xs = rng.integers(0, hi, 5)
    ys = rng.integers(0, hi, 5)
    ys[2] = xs[2]  # force an equal pair into the batch
    a = encrypt_radix(jax.random.key(62), sk.lv0, xs, d, MP, base_bits=3)
    b = encrypt_radix(jax.random.key(63), sk.lv0, ys, d, MP, base_bits=3)
    eq, gt, lt = compare_radix(a, b, ck, base_bits=3)
    np.testing.assert_array_equal(_dec_bool(eq, sk), xs == ys)
    np.testing.assert_array_equal(_dec_bool(gt, sk), xs > ys)
    np.testing.assert_array_equal(_dec_bool(lt, sk), xs < ys)


@pytest.mark.parametrize("d", [1, 2, 5])
def test_compare_radix_multi_value(mkeys, rng, d):
    """multi_value=True (one rotation per tree node, lut.multi_value)
    agrees with the default path on every tree shape."""
    sk, ck = mkeys
    hi = 1 << (3 * d)
    xs = rng.integers(0, hi, 5)
    ys = rng.integers(0, hi, 5)
    ys[1] = xs[1]
    a = encrypt_radix(jax.random.key(72), sk.lv0, xs, d, MP, base_bits=3)
    b = encrypt_radix(jax.random.key(73), sk.lv0, ys, d, MP, base_bits=3)
    eq, gt, lt = compare_radix(a, b, ck, base_bits=3, multi_value=True)
    np.testing.assert_array_equal(_dec_bool(eq, sk), xs == ys)
    np.testing.assert_array_equal(_dec_bool(gt, sk), xs > ys)
    np.testing.assert_array_equal(_dec_bool(lt, sk), xs < ys)


def test_select_radix(mkeys, rng):
    sk, ck = mkeys
    xs = rng.integers(0, 512, 6)
    ys = rng.integers(0, 512, 6)
    sels = rng.integers(0, 2, 6).astype(bool)
    t = encrypt_radix(jax.random.key(64), sk.lv0, xs, 3, MP, base_bits=3)
    f = encrypt_radix(jax.random.key(65), sk.lv0, ys, 3, MP, base_bits=3)
    sel = lwe_encrypt_bool(jax.random.key(66), sk.lv0, sels, MP.tlwe_lv0.alpha)
    out = select_radix(sel, t, f, ck, base_bits=3)
    got = decrypt_radix(out, sk.lv0, base_bits=3)
    np.testing.assert_array_equal(got, np.where(sels, xs, ys))


def test_min_max_radix(mkeys, rng):
    sk, ck = mkeys
    xs = rng.integers(0, 512, 4)
    ys = rng.integers(0, 512, 4)
    a = encrypt_radix(jax.random.key(67), sk.lv0, xs, 3, MP, base_bits=3)
    b = encrypt_radix(jax.random.key(68), sk.lv0, ys, 3, MP, base_bits=3)
    np.testing.assert_array_equal(
        decrypt_radix(min_radix(a, b, ck, base_bits=3), sk.lv0, base_bits=3),
        np.minimum(xs, ys),
    )
    np.testing.assert_array_equal(
        decrypt_radix(max_radix(a, b, ck, base_bits=3), sk.lv0, base_bits=3),
        np.maximum(xs, ys),
    )


def test_typed_api_radix_comparisons(mkeys, rng):
    """FheUintRadix operators: <, ==, >=, min, and FheBool.select routing."""
    sk, ck = mkeys
    xs = rng.integers(0, 64, 4)
    ys = rng.integers(0, 64, 4)
    ys[0] = xs[0]
    a = FheUintRadix.encrypt(jax.random.key(69), sk.lv0, xs, 2, ck, base_bits=3)
    b = FheUintRadix.encrypt(jax.random.key(70), sk.lv0, ys, 2, ck, base_bits=3)
    np.testing.assert_array_equal((a < b).decrypt(sk.lv0), xs < ys)
    np.testing.assert_array_equal((a == b).decrypt(sk.lv0), xs == ys)
    np.testing.assert_array_equal((a >= b).decrypt(sk.lv0), xs >= ys)
    np.testing.assert_array_equal(a.min(b).decrypt(sk.lv0), np.minimum(xs, ys))
    # plaintext operand coercion + FheBool.select over radix branches
    np.testing.assert_array_equal((a > 31).decrypt(sk.lv0), xs > 31)
    sel = FheBool.encrypt(jax.random.key(71), sk.lv0,
                          np.array([True, False, True, False]), ck)
    np.testing.assert_array_equal(
        sel.select(a, b).decrypt(sk.lv0), np.where([1, 0, 1, 0], xs, ys)
    )


def test_radix_bits_roundtrip(mkeys, rng):
    """radix -> bits -> radix roundtrip plus shift_digits (free moves)."""
    from rs_tfhe_tpu.models.arithmetic import (
        bits_to_radix,
        radix_to_bits,
        shift_digits,
    )
    sk, ck = mkeys
    xs = rng.integers(0, 512, 5)
    a = encrypt_radix(jax.random.key(80), sk.lv0, xs, 3, MP, base_bits=3)
    bits = radix_to_bits(a, ck, base_bits=3)
    assert bits.shape[-2] == 9
    got_bits = np.asarray(jax.device_get(lwe_decrypt_bool(bits, sk.lv0)))
    want_bits = np.stack([(xs >> i) & 1 for i in range(9)], axis=-1).astype(bool)
    np.testing.assert_array_equal(got_bits, want_bits)

    back = bits_to_radix(bits, ck, base_bits=3)
    np.testing.assert_array_equal(decrypt_radix(back, sk.lv0, base_bits=3), xs)

    up = shift_digits(a, 1, base_bits=3)
    np.testing.assert_array_equal(
        decrypt_radix(up, sk.lv0, base_bits=3), (xs * 8) % 512)
    down = shift_digits(a, -1, base_bits=3)
    np.testing.assert_array_equal(
        decrypt_radix(down, sk.lv0, base_bits=3), xs // 8)


def test_typed_api_casts(mkeys, rng):
    """FheUintRadix.to_bits -> FheUint ops -> FheUint.to_radix round trip."""
    from rs_tfhe_tpu.fhe import FheUint
    sk, ck = mkeys
    xs = rng.integers(0, 64, 3)
    a = FheUintRadix.encrypt(jax.random.key(81), sk.lv0, xs, 2, ck, base_bits=3)
    u = a.to_bits()
    assert isinstance(u, FheUint) and u.width == 6
    np.testing.assert_array_equal(u.decrypt(sk.lv0), xs)
    # bitwise XOR in bit-land (cheap there), then cast back to radix
    v = (u ^ 0b101010).to_radix(base_bits=3)
    np.testing.assert_array_equal(v.decrypt(sk.lv0), xs ^ 0b101010)
    # width not a multiple of base_bits: 4-bit -> 2 base-8 digits
    w4 = FheUint.encrypt(jax.random.key(82), sk.lv0, xs % 16, 4, ck)
    r = w4.to_radix(base_bits=3)
    assert r.num_digits == 2
    np.testing.assert_array_equal(r.decrypt(sk.lv0), xs % 16)
