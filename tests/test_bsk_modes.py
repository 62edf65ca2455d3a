"""BSK precompute layout (CloudKey.bsk_packed).

Round 2 removed the fully-expanded circulant precompute (config.bsk_mode):
it cannot exist at production scale on 16 GB chips (~35 GB at
SECURITY_128_BIT) and in-VMEM expansion measured faster anyway. The one
real precompute is the byte-packed limb layout the whole-rotation kernel
streams — pin its shape/derivation contract here.
"""

import jax.numpy as jnp
import numpy as np

from rs_tfhe_tpu.ops.pallas_blind_rotate import prepare_bsk_limbs
from rs_tfhe_tpu.torus import split_u32_limbs


def test_bsk_packed_is_derived_and_correctly_packed(ck):
    """CloudKey.bsk_packed == prepare_bsk_limbs(bsk), and unpacking byte q
    of each int32 word recovers balanced limb q of the negacyclic-extended
    BSK exactly."""
    p = ck.params
    packed = np.asarray(ck.bsk_packed)
    again = np.asarray(prepare_bsk_limbs(ck.bsk))
    np.testing.assert_array_equal(packed, again)
    n0, n1, j2 = p.n0, p.n1, 2 * p.trgsw_lv1.l
    assert packed.shape == (n0, 2, j2, 2 * n1)
    assert packed.dtype == np.int32

    from rs_tfhe_tpu.ops.poly import negacyclic_extend

    limbs = np.asarray(split_u32_limbs(negacyclic_extend(ck.bsk)))
    # [n0, 2L, 2, 2N, 4] -> packed is [n0, 2(o), 2L, 2N]
    for q in range(4):
        unpacked = ((packed << (24 - 8 * q)) >> 24).astype(np.int8)
        want = np.transpose(limbs[..., q], (0, 2, 1, 3))
        np.testing.assert_array_equal(unpacked, want, err_msg=f"limb {q}")


def test_blind_rotate_accepts_on_the_fly_packing(sk, ck, rng):
    """The bsk_packed argument is an optimization, not a requirement: the
    rotation must produce identical bits without it."""
    import jax

    from rs_tfhe_tpu.gates import _nand_lin
    from rs_tfhe_tpu.ops.blind_rotate import blind_rotate
    from rs_tfhe_tpu.tlwe import lwe_encrypt_bool

    p = ck.params
    bits = jnp.asarray(rng.integers(0, 2, 6).astype(bool))
    a = lwe_encrypt_bool(jax.random.key(1), sk.lv0, bits, p.tlwe_lv0.alpha)
    b = lwe_encrypt_bool(jax.random.key(2), sk.lv0, ~bits, p.tlwe_lv0.alpha)
    lin = _nand_lin(a, b)
    with_packed = np.asarray(
        blind_rotate(lin, ck.testvec, ck.bsk, p, bsk_packed=ck.bsk_packed)
    )
    without = np.asarray(blind_rotate(lin, ck.testvec, ck.bsk, p))
    np.testing.assert_array_equal(with_packed, without)
