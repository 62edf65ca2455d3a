"""Radix (LUT-based) homomorphic integer arithmetic.

The batch-first analogue of the reference's nibble-LUT method
(rs-tfhe examples/lut_add_two_numbers.rs: 8-bit addition in 3 programmable
bootstraps instead of ~40 gate bootstraps). Integers are vectors of base-2^b
digits, each an LWE message encoded with modulus 2^(b+1) so one digit can
absorb a carry without wrapping.

Per digit position the (result, carry) pair runs as ONE batched programmable
bootstrap with two different test vectors — per-ciphertext LUTs are a single
blind-rotation batch on TPU, something the reference's scalar API cannot
express.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..bootstrap import bootstrap_with_testvec
from ..key import CloudKey
from ..lut.generator import Generator
from ..tlwe import lwe_decrypt_message, lwe_encrypt_message


def encrypt_radix(
    key: jax.Array, sk_lv0: jax.Array, val, num_digits: int, params, base_bits: int = 3
):
    """Encrypt integers as [..., num_digits, n0+1] base-2^base_bits digit
    vectors (LSB first), encoded with message modulus 2^(base_bits+1)."""
    val = np.asarray(val)
    digits = np.stack(
        [(val >> (base_bits * i)) & ((1 << base_bits) - 1) for i in range(num_digits)],
        axis=-1,
    )
    modulus = 1 << (base_bits + 1)
    return lwe_encrypt_message(
        key, sk_lv0, jnp.asarray(digits), modulus, params.tlwe_lv0.alpha
    )


def decrypt_radix(ct: jax.Array, sk_lv0: jax.Array, base_bits: int = 3):
    """Decrypt [..., D, n0+1] digit vectors back to integers."""
    modulus = 1 << (base_bits + 1)
    digits = np.asarray(lwe_decrypt_message(ct, sk_lv0, modulus))
    val = np.zeros(digits.shape[:-1], dtype=np.int64)
    for i in range(digits.shape[-1]):
        val |= (digits[..., i] & ((1 << base_bits) - 1)) << (base_bits * i)
    return val


def add_radix(a: jax.Array, b: jax.Array, ck: CloudKey, base_bits: int = 3):
    """Digit-vector addition, 2D - 1 programmable bootstraps for D digits.

    a, b: uint32 [..., D, n0+1]. The linear ciphertext add produces the raw
    digit sum in [0, 2^(b+1)); one PBS extracts sum mod 2^b, a second
    (batched into the same blind rotation) extracts the carry.

    base_bits=4 is the reference's "8-bit add in 3 PBS" nibble method
    (README.md:220). Its modulus-32 encoding leaves only ~2 sigma of
    mod-switch margin at the N=1024 sets (the reference has the same bound,
    plus an uncentered-decomposition bias we fixed) — use
    SECURITY_128_BIT_RADIX (N=2048), engineered for ~7.3 sigma at base 16
    (utils.noise.lut_margin), to run nibbles reliably. At the N=1024 sets
    the default base_bits=3 (modulus 16) is the right choice.
    """
    d = a.shape[-2]
    base = 1 << base_bits
    modulus = 2 * base
    gen = Generator(modulus, ck.params)
    lut_mod = gen.generate_lookup_table(lambda x: x % base).poly  # [2, N]
    lut_div = gen.generate_lookup_table(lambda x: x // base).poly

    carry = None
    outs = []
    for i in range(d):
        s = a[..., i, :] + b[..., i, :]
        if carry is not None:
            s = s + carry
        if i + 1 < d:
            pair = jnp.stack([s, s], axis=-2)  # [..., 2, n0+1]
            tv = jnp.broadcast_to(
                jnp.stack([lut_mod, lut_div]), (*s.shape[:-1], 2, *lut_mod.shape)
            )
            res = bootstrap_with_testvec(pair, tv, ck)
            outs.append(res[..., 0, :])
            carry = res[..., 1, :]
        else:
            outs.append(bootstrap_with_testvec(s, lut_mod, ck))
    return jnp.stack(outs, axis=-2)


def apply_lut_radix(ct: jax.Array, f, ck: CloudKey, base_bits: int = 3):
    """Apply a per-digit function via one batched programmable bootstrap over
    all digit positions (and any outer batch) at once."""
    modulus = 1 << (base_bits + 1)
    lut = Generator(modulus, ck.params).generate_lookup_table(f).poly
    return bootstrap_with_testvec(ct, lut, ck)
