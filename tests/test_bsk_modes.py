"""Precomputed vs on-the-fly BSK circulant modes give identical results.

The precomputed mode is the analogue of the reference's frequency-domain
BSK (TRGSWLv1FFT, trgsw.rs:52-75): the per-step circulant operands are
materialized once at key preparation (huge at production N, fine at tiny)."""

import jax
import jax.numpy as jnp
import numpy as np

from rs_tfhe_tpu import gates
from rs_tfhe_tpu.key import CloudKey, prepare_bsk
from rs_tfhe_tpu.tlwe import lwe_decrypt_bool, lwe_encrypt_bool


def test_precomputed_bsk_matches_onthefly(sk, ck, rng):
    ck_pre = CloudKey(
        testvec=ck.testvec,
        ksk_limbs=ck.ksk_limbs,
        bsk=ck.bsk,
        bsk_prepared=prepare_bsk(ck.bsk),
        params=ck.params,
    )
    assert ck_pre.precomputed and not ck.precomputed

    bits_a = jnp.asarray(rng.integers(0, 2, 6).astype(bool))
    bits_b = jnp.asarray(rng.integers(0, 2, 6).astype(bool))
    ka, kb = jax.random.split(jax.random.key(17))
    a = lwe_encrypt_bool(ka, sk.lv0, bits_a, sk.params.tlwe_lv0.alpha)
    b = lwe_encrypt_bool(kb, sk.lv0, bits_b, sk.params.tlwe_lv0.alpha)

    out_fly = np.asarray(gates.nand(a, b, ck))
    out_pre = np.asarray(gates.nand(a, b, ck_pre))
    np.testing.assert_array_equal(out_pre, out_fly)  # bit-identical pipelines
    np.testing.assert_array_equal(
        np.asarray(lwe_decrypt_bool(jnp.asarray(out_pre), sk.lv0)),
        ~(np.asarray(bits_a) & np.asarray(bits_b)),
    )
