"""Encrypted sorting-network tests (TEST_TINY parameters, CPU).

The reference has no sorting capability (src/circuits.rs is a dead 9-LoC
comparator sketch, SURVEY.md §1); these cover the beyond-reference bitonic
networks in models/sort.py for both integer representations.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rs_tfhe_tpu import models
from rs_tfhe_tpu.bit_utils import decrypt_uint, encrypt_uint
from rs_tfhe_tpu.models.sort import (
    _bitonic_schedule,
    sort_bits,
    sort_radix,
    top_k_bits,
)

W = 4
BASE_BITS = 2


def _enc_many(sk, vals, seed=7):
    cts = [
        encrypt_uint(jax.random.key(seed + i), sk.lv0, int(v), W,
                     sk.params.tlwe_lv0.alpha)
        for i, v in enumerate(vals)
    ]
    return jnp.stack(cts, axis=0)  # [K, W, n0+1]


def _dec_many(cts, sk):
    return [int(decrypt_uint(cts[i], sk.lv0)) for i in range(cts.shape[0])]


def test_bitonic_schedule_plaintext():
    # the schedule itself sorts plaintext arrays for every direction mix
    rng = np.random.default_rng(0)
    for k in (2, 4, 8, 16):
        x = rng.integers(0, 100, size=k)
        for lo, hi, desc in _bitonic_schedule(k):
            a, b = x[lo].copy(), x[hi].copy()
            swap = np.where(desc, a <= b, a > b)
            x[lo] = np.where(swap, b, a)
            x[hi] = np.where(swap, a, b)
        assert (x == np.sort(x)).all(), k


def test_sort_bits_pow2(sk, ck):
    vals = [9, 3, 14, 3]
    out = sort_bits(_enc_many(sk, vals), ck)
    assert _dec_many(out, sk) == sorted(vals)


def test_sort_bits_padded_and_descending(sk, ck):
    vals = [5, 0, 11]  # K=3 pads to 4 with MAX sentinels
    cts = _enc_many(sk, vals)
    assert _dec_many(sort_bits(cts, ck), sk) == sorted(vals)
    out = sort_bits(cts, ck, descending=True)
    assert out.shape[0] == 3
    assert _dec_many(out, sk) == sorted(vals, reverse=True)


def test_top_k_bits(sk, ck):
    vals = [7, 2, 12, 4]
    out = top_k_bits(_enc_many(sk, vals), 2, ck, largest=True)
    assert _dec_many(out, sk) == [12, 7]


def test_sort_bits_batched(sk, ck):
    # independent batch columns sort in the same dispatches
    cols = [[6, 1], [2, 13]]  # batch axis between K and W
    cts = jnp.stack(
        [_enc_many(sk, [cols[0][j], cols[1][j]], seed=20 + 5 * j)
         for j in range(2)],
        axis=1,
    )  # [K=2, B=2, W, n0+1]
    out = sort_bits(cts, ck)
    got = [[int(decrypt_uint(out[i, j], sk.lv0)) for i in range(2)]
           for j in range(2)]
    assert got[0] == sorted([cols[0][0], cols[1][0]])
    assert got[1] == sorted([cols[0][1], cols[1][1]])


def test_sort_radix(sk, ck):
    vals = np.array([11, 4, 9])  # K=3 pads to 4; D=2 digits of 2 bits
    cts = jnp.stack(
        [models.encrypt_radix(jax.random.key(40 + i), sk.lv0,
                              np.array(int(v)), 2, sk.params, BASE_BITS)
         for i, v in enumerate(vals)],
        axis=0,
    )  # [K, D, n0+1]
    out = sort_radix(cts, ck, BASE_BITS)
    got = [int(models.decrypt_radix(out[i], sk.lv0, BASE_BITS))
           for i in range(3)]
    assert got == sorted(vals.tolist())
