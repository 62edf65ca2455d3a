"""Nussbaumer transform path: exactness vs the direct circulant path.

The algorithm maps size-N negacyclic convolution onto 2r size-m pointwise
convolutions with shift-only twiddles — exact over wrapping int32 (see
ops/nussbaumer.py). These must be BIT-identical, not approximately equal."""

import jax
import jax.numpy as jnp
import numpy as np

import rs_tfhe_tpu.config as C
from rs_tfhe_tpu import gates
from rs_tfhe_tpu.ops.nussbaumer import (
    check_bounds,
    external_product_step,
    prepare_bsk_step,
)
from rs_tfhe_tpu.ops.poly import build_step_matrix, polymul_small_by_torus_multi
from rs_tfhe_tpu.tlwe import lwe_decrypt_bool, lwe_encrypt_bool


def test_bounds_for_param_sets(tiny):
    import rs_tfhe_tpu as tfhe

    assert check_bounds(tiny)
    assert check_bounds(tfhe.SECURITY_128_BIT)
    assert check_bounds(tfhe.SECURITY_80_BIT)
    assert not check_bounds(tfhe.SECURITY_UINT4)  # bgbit=22 exceeds int16


def test_external_product_matches_direct(tiny, rng):
    g = tiny.trgsw_lv1
    j2, n = 2 * g.l, tiny.n1
    bsk_i = jnp.asarray(rng.integers(0, 1 << 32, (j2, 2, n), dtype=np.uint32))
    d = jnp.asarray(
        rng.integers(-g.half_bg, g.half_bg, (5, j2, n)), dtype=jnp.int32
    )
    ref = polymul_small_by_torus_multi(
        d, build_step_matrix(bsk_i), tiny.digit_limbs, 2
    )
    got = external_product_step(d, prepare_bsk_step(bsk_i, tiny), tiny)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_full_gate_matches_xla_path(sk, ck, rng):
    bits_a = jnp.asarray(rng.integers(0, 2, 4).astype(bool))
    bits_b = jnp.asarray(rng.integers(0, 2, 4).astype(bool))
    ka, kb = jax.random.split(jax.random.key(23))
    a = lwe_encrypt_bool(ka, sk.lv0, bits_a, sk.params.tlwe_lv0.alpha)
    b = lwe_encrypt_bool(kb, sk.lv0, bits_b, sk.params.tlwe_lv0.alpha)
    old = C.config.step_impl
    try:
        C.config.step_impl = "xla"
        ref = np.asarray(gates.nand(a, b, ck))
        C.config.step_impl = "nussbaumer"
        got = np.asarray(gates.nand(a, b, ck))
    finally:
        C.config.step_impl = old
    np.testing.assert_array_equal(got, ref)
    np.testing.assert_array_equal(
        np.asarray(lwe_decrypt_bool(jnp.asarray(got), sk.lv0)),
        ~(np.asarray(bits_a) & np.asarray(bits_b)),
    )
