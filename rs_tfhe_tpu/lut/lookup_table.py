"""Lookup tables for programmable bootstrapping.

A LUT is a trivial TRLWE (a = 0, function values in b) used as the blind
rotation test vector. Reference: rs-tfhe lut/lookup_table.rs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LookupTable:
    """poly: uint32 [2, N] (or [B, 2, N] for per-ciphertext tables)."""

    poly: jax.Array

    @staticmethod
    def from_poly(poly: jax.Array) -> "LookupTable":
        return LookupTable(poly=poly)

    @property
    def is_empty(self) -> bool:
        return bool(jnp.all(self.poly == 0))

    # ---- TRLWE conversions (reference: lut/lookup_table.rs:76-86) ----
    # A TRLWE ciphertext here IS a uint32 [2, N] array (trlwe.py), so these
    # mirror the reference's From<TRLWELv1>/From<LookupTable> impls.

    def as_trlwe(self) -> jax.Array:
        """The underlying TRLWE ciphertext, uint32 [..., 2, N]."""
        return self.poly

    @staticmethod
    def from_trlwe(ct: jax.Array) -> "LookupTable":
        """Wrap a (possibly non-trivial, i.e. encrypted) TRLWE as a LUT."""
        ct = jnp.asarray(ct, dtype=jnp.uint32)
        if ct.ndim < 2 or ct.shape[-2] != 2:
            raise ValueError(f"expected [..., 2, N] TRLWE, got {ct.shape}")
        return LookupTable(poly=ct)
