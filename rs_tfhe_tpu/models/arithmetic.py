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
    (README.md:220). Margins by parameter set (utils.noise.lut_margin):
    the N=1024 sets give ~1-2 sigma at modulus 32 (the reference has the
    same bound, plus an uncentered-decomposition bias we fixed);
    SECURITY_128_BIT_RADIX (N=2048) gives ~3.7 sigma (p ~ 1e-4/PBS, 200x
    the reference's reliability, and 7.3 sigma = certified at base_bits=3);
    SECURITY_128_BIT_NIBBLE (N=4096) certifies base_bits=4 at ~6.5 sigma
    (p < 1e-9) — use it when nibble adds must not fail.
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


def _col_bounds(d: int, base: int) -> list[int]:
    """Exact worst-case column-sum bounds for mul_radix's carry-save stage:
    column k sums (base-1)-valued lo products (i+j=k), hi products
    (i+j=k-1) and the incoming carry."""
    def n_pairs(k):
        return max(0, min(k, d - 1) - max(0, k - d + 1) + 1)

    bounds, carry = [], 0
    for k in range(2 * d):
        t = (base - 1) * (n_pairs(k) + n_pairs(k - 1)) + carry
        bounds.append(t)
        carry = t // base
    return bounds


def mul_radix(a: jax.Array, b: jax.Array, ck: CloudKey, base_bits: int = 2):
    """Ciphertext x ciphertext multiplication over base-2^b digit vectors —
    a capability the reference does not have (its only multiplications are
    plaintext scalars, tlwe.rs:160-214).

    a, b: uint32 [..., D, n0+1] (encrypt_radix encoding). Returns the full
    2D-digit product. Three batched-PBS stages, all margins engineered for
    SECURITY_128_BIT_RADIX (utils.noise.lut_margin):

      1. re-encode (one batched PBS, 2D cts): a_i -> v/(2*base) raw,
         b_j -> v/(2*base^2) raw, so the LINEAR sum base*a_i + b_j becomes
         a modulus-base^2 encoding of the digit pair w = base*v_a + v_b.
      2. bivariate products (one batched per-ct-LUT PBS, 2*D^2 cts):
         lo_ij = (w//base)*(w%base) mod base and hi_ij = .. // base, both
         output at scale 1/(4*base^2) for the column stage.
      3. carry-save columns (2 PBS per column, sequential in k): column
         sums are linear; exact bounds (_col_bounds) stay under the
         modulus-2*base^2 range (e.g. 27 < 32 at D=4, base=4), then one
         PBS extracts the standard-encoded digit and one the carry.

    Total: 2D^2 + 6D programmable bootstraps (56 for 8-bit x 8-bit),
    batched over any leading dims. Requires _col_bounds < 2*base^2
    (asserted): base_bits=2 supports D <= 4 (8-bit operands).

    Margins: the modulus-32 column stage is the binding one
    (utils.noise.lut_margin(params, 32, 8)): ~6.5 sigma (p < 1e-9) at
    SECURITY_128_BIT_NIBBLE — the certified choice — vs ~3.4 sigma
    (p ~ 7e-4/PBS) at SECURITY_128_BIT_RADIX.
    """
    d = a.shape[-2]
    base = 1 << base_bits
    m_pair = base * base
    m_col = 2 * base * base
    bounds = _col_bounds(d, base)
    assert max(bounds) < m_col, (
        f"column bound {max(bounds)} overflows modulus {m_col}; "
        f"reduce D or base_bits"
    )
    m_enc = 1 << (base_bits + 1)  # standard digit encoding modulus

    gen_enc = Generator(m_enc, ck.params)
    full32 = np.uint64(1) << 32
    # stage 1: re-encode digits for pairing (input modulus m_enc)
    lut_a = gen_enc.generate_lookup_table_full(
        lambda v: np.uint32((v % base) * full32 // (2 * base) % full32)
    ).poly
    lut_b = gen_enc.generate_lookup_table_full(
        lambda v: np.uint32((v % base) * full32 // (2 * m_pair) % full32)
    ).poly
    both = jnp.concatenate([a, b], axis=-2)  # [..., 2D, n+1]
    tvs = jnp.concatenate(
        [
            jnp.broadcast_to(lut_a, (*a.shape[:-1], *lut_a.shape)),
            jnp.broadcast_to(lut_b, (*b.shape[:-1], *lut_b.shape)),
        ],
        axis=-3,
    )
    enc = bootstrap_with_testvec(both, tvs, ck)
    a2, b2 = enc[..., :d, :], enc[..., d:, :]

    # stage 2: all D^2 pairs, lo/hi products via per-ciphertext LUTs
    gen_pair = Generator(m_pair, ck.params)
    lut_lo = gen_pair.generate_lookup_table_full(
        lambda w: np.uint32(((w // base) * (w % base) % base) * full32
                            // (2 * m_col) % full32)
    ).poly
    lut_hi = gen_pair.generate_lookup_table_full(
        lambda w: np.uint32(((w // base) * (w % base) // base) * full32
                            // (2 * m_col) % full32)
    ).poly
    pairs = a2[..., :, None, :] + b2[..., None, :, :]  # [..., D, D, n+1]
    pairs = pairs.reshape(*pairs.shape[:-3], d * d, pairs.shape[-1])
    pp = jnp.concatenate([pairs, pairs], axis=-2)  # lo block then hi block
    tvs2 = jnp.concatenate(
        [
            jnp.broadcast_to(lut_lo, (*pairs.shape[:-1], *lut_lo.shape)),
            jnp.broadcast_to(lut_hi, (*pairs.shape[:-1], *lut_hi.shape)),
        ],
        axis=-3,
    )
    prod = bootstrap_with_testvec(pp, tvs2, ck)
    lo = prod[..., : d * d, :].reshape(*a.shape[:-2], d, d, a.shape[-1])
    hi = prod[..., d * d :, :].reshape(*a.shape[:-2], d, d, a.shape[-1])

    # stage 3: column carry-save (input modulus m_col)
    gen_col = Generator(m_col, ck.params)
    lut_dig = gen_col.generate_lookup_table_full(
        lambda t: np.uint32((t % base) * full32 // (2 * m_enc) % full32)
    ).poly
    lut_car = gen_col.generate_lookup_table_full(
        lambda t: np.uint32((t % m_col) // base * full32 // (2 * m_col) % full32)
    ).poly
    outs = []
    carry = None
    for k in range(2 * d):
        s = None
        for i in range(d):
            j = k - i
            if 0 <= j < d:
                s = lo[..., i, j, :] if s is None else s + lo[..., i, j, :]
            j2 = k - 1 - i
            if 0 <= j2 < d:
                s = hi[..., i, j2, :] if s is None else s + hi[..., i, j2, :]
        if carry is not None:
            s = s + carry
        if k + 1 < 2 * d:
            pair = jnp.stack([s, s], axis=-2)
            tv = jnp.broadcast_to(
                jnp.stack([lut_dig, lut_car]), (*s.shape[:-1], 2, *lut_dig.shape)
            )
            res = bootstrap_with_testvec(pair, tv, ck)
            outs.append(res[..., 0, :])
            carry = res[..., 1, :]
        else:
            outs.append(bootstrap_with_testvec(s, lut_dig, ck))
    return jnp.stack(outs, axis=-2)
