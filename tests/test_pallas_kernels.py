"""Pallas kernel bit-exactness vs the XLA path (interpret mode on CPU).

The real-TPU equivalence run is part of the bench flow; these tests keep the
kernels honest in CI without TPU hardware. Shapes: smallest eligible
(N = 128, batch = 128)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rs_tfhe_tpu.config as C
from rs_tfhe_tpu.ops import blind_rotate as BR
from rs_tfhe_tpu.ops.pallas_blind_rotate import fused_blind_rotate, prepare_bsk_limbs
from rs_tfhe_tpu.ops.pallas_step import fused_external_product
from rs_tfhe_tpu.ops.poly import (
    build_step_matrix,
    negacyclic_extend,
    polymul_small_by_torus_multi,
)
from rs_tfhe_tpu.params import TfheParams, TlweParams, TrgswParams, TrlweParams
from rs_tfhe_tpu.torus import split_u32_limbs

#: smallest kernel-eligible parameter set (N = 128, digit_limbs = 1)
KP = TfheParams(
    security_bits=0,
    description="kernel-eligible tiny set",
    tlwe_lv0=TlweParams(n=8, alpha=1.0e-9),
    tlwe_lv1=TlweParams(n=128, alpha=1.0e-12),
    trlwe_lv1=TrlweParams(n=128, alpha=1.0e-12),
    trgsw_lv1=TrgswParams(n=128, nbit=7, bgbit=6, l=2, basebit=2, iks_t=8, alpha=1.0e-12),
)


def test_fused_external_product_matches_xla(rng):
    j, o, n, f = 4, 2, 128, 128
    t = jnp.asarray(rng.integers(0, 1 << 32, (j, o, n), dtype=np.uint32))
    d = jnp.asarray(rng.integers(-32, 32, (f, j, n)), dtype=jnp.int32)
    ref = polymul_small_by_torus_multi(d, build_step_matrix(t), 1, 2)
    xl = jnp.transpose(split_u32_limbs(negacyclic_extend(t)), (1, 3, 0, 2))
    got = fused_external_product(d.astype(jnp.int8).reshape(f, j * n), xl, 2,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_blind_rotate_matches_xla(rng):
    batch, n0, n1 = 128, KP.n0, KP.n1
    bsk = jnp.asarray(
        rng.integers(0, 1 << 32, (n0, 2 * KP.trgsw_lv1.l, 2, n1), dtype=np.uint32)
    )
    ct = jnp.asarray(rng.integers(0, 1 << 32, (batch, n0 + 1), dtype=np.uint32))
    tv = jnp.asarray(rng.integers(0, 1 << 32, (2, n1), dtype=np.uint32))

    assert C.config.step_impl == "auto"
    ref = np.asarray(BR.blind_rotate(ct, tv, bsk, KP))

    b_til = ((2 * n1 - BR.modswitch(ct[:, n0], KP)) % (2 * n1)).astype(jnp.int32)
    a_til = BR.modswitch(ct[:, :n0], KP).T
    got = fused_blind_rotate(
        b_til, a_til, tv, prepare_bsk_limbs(bsk), KP, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), ref)
