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
