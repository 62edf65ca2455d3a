"""Integer <-> bit <-> ciphertext conversion helpers.

Reference: rs-tfhe bit_utils.rs. Bit order is LSB-first (to_bits,
bit_utils.rs:74-83); `convert` folds bits back MSB-down (bit_utils.rs:9-19).
Encryption of a uint yields a batch [num_bits, n0+1] — the batch axis *is*
the bit axis, so whole-integer circuits (models/) run every bit position in
one bootstrap batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .tlwe import lwe_encrypt_bool


def to_bits(val: int, size: int) -> np.ndarray:
    """LSB-first bit vector (reference bit_utils.rs:74-83)."""
    return np.array([(val >> i) & 1 for i in range(size)], dtype=bool)


def from_bits(bits) -> int:
    """Bits (LSB-first) -> integer (reference `convert`, bit_utils.rs:9-19)."""
    bits = np.asarray(bits, dtype=bool)
    return int(sum(int(b) << i for i, b in enumerate(bits)))


def encrypt_uint(
    key: jax.Array, sk_lv0: jax.Array, val: int, size: int, alpha: float
) -> jax.Array:
    """Encrypt `size` bits of val as a ciphertext batch [size, n0+1].

    Reference: the AsBits trait (bit_utils.rs:25-72), batched.
    """
    bits = jnp.asarray(to_bits(val, size))
    return lwe_encrypt_bool(key, sk_lv0, bits, alpha)


def decrypt_uint(ct: jax.Array, sk_lv0: jax.Array) -> int:
    """Decrypt a bit-batch ciphertext back to an integer."""
    from .tlwe import lwe_decrypt_bool

    return from_bits(np.asarray(jax.device_get(lwe_decrypt_bool(ct, sk_lv0))))
