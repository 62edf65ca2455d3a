"""Pallas kernel bit-exactness vs the XLA path (interpret mode on CPU).

The real-TPU equivalence run is part of the bench flow; these tests keep the
kernels honest in CI without TPU hardware. Shapes: smallest eligible
(N = 128, batch = 128)."""

import jax
import jax.numpy as jnp
import numpy as np

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


def test_fused_blind_rotate_rounded_bsk_drop_limbs(rng):
    """BSK rounded to 24 bits (key.round_bsk): the low limb plane is zero,
    so drop_limbs=1 must be bit-exact vs both drop_limbs=0 and the XLA
    path on the SAME rounded key."""
    import dataclasses

    from rs_tfhe_tpu.key import round_bsk

    kp = dataclasses.replace(KP, bsk_round_bits=8)
    batch, n0, n1 = 128, kp.n0, kp.n1
    bsk = round_bsk(
        jnp.asarray(
            rng.integers(0, 1 << 32, (n0, 2 * kp.trgsw_lv1.l, 2, n1), dtype=np.uint32)
        ),
        kp.bsk_round_bits,
    )
    assert int(jnp.max(bsk & jnp.uint32(0xFF))) == 0  # low byte zeroed
    ct = jnp.asarray(rng.integers(0, 1 << 32, (batch, n0 + 1), dtype=np.uint32))
    tv = jnp.asarray(rng.integers(0, 1 << 32, (2, n1), dtype=np.uint32))

    ref = np.asarray(BR.blind_rotate(ct, tv, bsk, kp))  # XLA scan path on CPU

    b_til = ((2 * n1 - BR.modswitch(ct[:, n0], kp)) % (2 * n1)).astype(jnp.int32)
    a_til = BR.modswitch(ct[:, :n0], kp).T
    packed = prepare_bsk_limbs(bsk)
    full = fused_blind_rotate(b_til, a_til, tv, packed, kp, interpret=True)
    dropped = fused_blind_rotate(
        b_til, a_til, tv, packed, kp, interpret=True, drop_limbs=1
    )
    np.testing.assert_array_equal(np.asarray(full), ref)
    np.testing.assert_array_equal(np.asarray(dropped), ref)


def test_gate_correct_with_rounded_bsk(rng):
    """Full NAND bootstrap decrypts correctly when the parameter set rounds
    the BSK (TEST_TINY margins dwarf the 2^-25-scale rounding noise)."""
    import dataclasses

    from rs_tfhe_tpu import gates
    from rs_tfhe_tpu.key import CloudKey, SecretKey
    from rs_tfhe_tpu.params import TEST_TINY
    from rs_tfhe_tpu.tlwe import lwe_decrypt_bool, lwe_encrypt_bool

    p = dataclasses.replace(TEST_TINY, bsk_round_bits=8)
    sk = SecretKey.generate(jax.random.key(11), p)
    ck = CloudKey.generate(jax.random.key(12), sk)
    assert int(jnp.max(ck.bsk & jnp.uint32(0xFF))) == 0
    m = jnp.asarray(rng.integers(0, 2, 16).astype(bool))
    a = lwe_encrypt_bool(jax.random.key(13), sk.lv0, m, p.tlwe_lv0.alpha)
    b = lwe_encrypt_bool(jax.random.key(14), sk.lv0, ~m, p.tlwe_lv0.alpha)
    out = gates.nand(a, b, ck)
    got = np.asarray(lwe_decrypt_bool(out, sk.lv0))
    np.testing.assert_array_equal(got, ~(np.asarray(m) & ~np.asarray(m)))


def test_select_fb():
    """fb=128 at every ring size (the kernel raises the scoped-VMEM cap
    for n > 1024); small batches shrink to the next power of two >= 8."""
    from rs_tfhe_tpu.ops.blind_rotate import select_fb

    assert select_fb(4096, 1024) == 128
    assert select_fb(128, 1024) == 128
    assert select_fb(1, 1024) == 8
    assert select_fb(20, 1024) == 32
    assert select_fb(512, 2048) == 128
    assert select_fb(512, 4096) == 128
    assert select_fb(8, 2048) == 8


#: multi-limb tiny set: bgbit=10 -> digits split into 2 balanced int8 limbs
KP_ML = TfheParams(
    security_bits=0,
    description="kernel-eligible tiny set, multi-limb digits",
    tlwe_lv0=TlweParams(n=8, alpha=1.0e-9),
    tlwe_lv1=TlweParams(n=128, alpha=1.0e-12),
    trlwe_lv1=TrlweParams(n=128, alpha=1.0e-12),
    trgsw_lv1=TrgswParams(n=128, nbit=7, bgbit=10, l=2, basebit=2, iks_t=8,
                          alpha=1.0e-12),
)


def test_fused_blind_rotate_multilimb_matches_xla(rng):
    """bgbit=10 digits need 2 balanced int8 limbs; the kernel's (dl, q)
    limb-pair contraction must reproduce the XLA multi-limb path exactly."""
    assert KP_ML.digit_limbs == 2
    batch, n0, n1 = 128, KP_ML.n0, KP_ML.n1
    bsk = jnp.asarray(
        rng.integers(0, 1 << 32, (n0, 2 * KP_ML.trgsw_lv1.l, 2, n1),
                     dtype=np.uint32)
    )
    ct = jnp.asarray(rng.integers(0, 1 << 32, (batch, n0 + 1), dtype=np.uint32))
    tv = jnp.asarray(rng.integers(0, 1 << 32, (2, n1), dtype=np.uint32))

    import rs_tfhe_tpu.config as CC
    prev = CC.config.step_impl
    CC.config.step_impl = "xla"  # force the scan path for the oracle
    try:
        ref = np.asarray(BR.blind_rotate(ct, tv, bsk, KP_ML))
    finally:
        CC.config.step_impl = prev

    b_til = ((2 * n1 - BR.modswitch(ct[:, n0], KP_ML)) % (2 * n1)).astype(jnp.int32)
    a_til = BR.modswitch(ct[:, :n0], KP_ML).T
    got = fused_blind_rotate(
        b_til, a_til, tv, prepare_bsk_limbs(bsk), KP_ML, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_fused_blind_rotate_column_chunks_match(rng):
    """The chunked-rhs path (used at N=4096 where a full circulant tile
    OOMs VMEM) must be bit-identical to the single-chunk path."""
    batch, n0, n1 = 128, KP.n0, KP.n1
    bsk = jnp.asarray(
        rng.integers(0, 1 << 32, (n0, 2 * KP.trgsw_lv1.l, 2, n1), dtype=np.uint32)
    )
    ct = jnp.asarray(rng.integers(0, 1 << 32, (batch, n0 + 1), dtype=np.uint32))
    tv = jnp.asarray(rng.integers(0, 1 << 32, (2, n1), dtype=np.uint32))
    b_til = ((2 * n1 - BR.modswitch(ct[:, n0], KP)) % (2 * n1)).astype(jnp.int32)
    a_til = BR.modswitch(ct[:, :n0], KP).T
    packed = prepare_bsk_limbs(bsk)
    one = fused_blind_rotate(b_til, a_til, tv, packed, KP, interpret=True)
    chunked = fused_blind_rotate(
        b_til, a_til, tv, packed, KP, interpret=True, col_chunk=64
    )  # 2 chunks at N=128
    np.testing.assert_array_equal(np.asarray(one), np.asarray(chunked))


def test_fused_blind_rotate_wide_matches_narrow(rng):
    """The step-major whole-batch-resident kernel (scratch-built rhs, one
    K/N-stacked dot per limb) is bit-exact vs the per-tile kernel across
    supers/tiles (batch 512, super 256 -> 2 supers x 2 tiles)."""
    from rs_tfhe_tpu.ops.pallas_blind_rotate import fused_blind_rotate_wide

    batch, n0, n1 = 512, KP.n0, KP.n1
    bsk = jnp.asarray(
        rng.integers(0, 1 << 32, (n0, 2 * KP.trgsw_lv1.l, 2, n1), dtype=np.uint32)
    )
    ct = jnp.asarray(rng.integers(0, 1 << 32, (batch, n0 + 1), dtype=np.uint32))
    tv = jnp.asarray(rng.integers(0, 1 << 32, (2, n1), dtype=np.uint32))

    b_til = ((2 * n1 - BR.modswitch(ct[:, n0], KP)) % (2 * n1)).astype(jnp.int32)
    a_til = BR.modswitch(ct[:, :n0], KP).T
    packed = prepare_bsk_limbs(bsk)
    ref = np.asarray(
        fused_blind_rotate(b_til, a_til, tv, packed, KP, interpret=True)
    )
    got = fused_blind_rotate_wide(
        b_til, a_til, tv, packed, KP, interpret=True, super_b=256
    )
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_fused_blind_rotate_wide_drop_limbs_and_per_ct_tv(rng):
    """Wide kernel: reduced-modulus BSK (drop_limbs=1) + per-ciphertext test
    vectors, vs the per-tile kernel."""
    import dataclasses

    from rs_tfhe_tpu.key import round_bsk
    from rs_tfhe_tpu.ops.pallas_blind_rotate import fused_blind_rotate_wide

    kp = dataclasses.replace(KP, bsk_round_bits=8)
    batch, n0, n1 = 256, kp.n0, kp.n1
    bsk = round_bsk(
        jnp.asarray(
            rng.integers(0, 1 << 32, (n0, 2 * kp.trgsw_lv1.l, 2, n1),
                         dtype=np.uint32)
        ),
        8,
    )
    ct = jnp.asarray(rng.integers(0, 1 << 32, (batch, n0 + 1), dtype=np.uint32))
    tv = jnp.asarray(rng.integers(0, 1 << 32, (batch, 2, n1), dtype=np.uint32))

    b_til = ((2 * n1 - BR.modswitch(ct[:, n0], kp)) % (2 * n1)).astype(jnp.int32)
    a_til = BR.modswitch(ct[:, :n0], kp).T
    packed = prepare_bsk_limbs(bsk)
    ref = np.asarray(
        fused_blind_rotate(b_til, a_til, tv, packed, kp, interpret=True,
                           drop_limbs=1)
    )
    got = fused_blind_rotate_wide(
        b_til, a_til, tv, packed, kp, interpret=True, drop_limbs=1, super_b=256
    )
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_fused_blind_rotate_wide_multilimb(rng):
    """Wide kernel with 2-limb digits (bgbit=10): the (dl, q) pairs ride the
    K-stacked lhs planes; bit-exact vs the per-tile kernel."""
    from rs_tfhe_tpu.ops.pallas_blind_rotate import fused_blind_rotate_wide

    batch, n0, n1 = 256, KP_ML.n0, KP_ML.n1
    bsk = jnp.asarray(
        rng.integers(0, 1 << 32, (n0, 2 * KP_ML.trgsw_lv1.l, 2, n1),
                     dtype=np.uint32)
    )
    ct = jnp.asarray(rng.integers(0, 1 << 32, (batch, n0 + 1), dtype=np.uint32))
    tv = jnp.asarray(rng.integers(0, 1 << 32, (2, n1), dtype=np.uint32))

    b_til = ((2 * n1 - BR.modswitch(ct[:, n0], KP_ML)) % (2 * n1)).astype(jnp.int32)
    a_til = BR.modswitch(ct[:, :n0], KP_ML).T
    packed = prepare_bsk_limbs(bsk)
    ref = np.asarray(
        fused_blind_rotate(b_til, a_til, tv, packed, KP_ML, interpret=True)
    )
    got = fused_blind_rotate_wide(
        b_til, a_til, tv, packed, KP_ML, interpret=True, super_b=256
    )
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_fused_blind_rotate_small_matches_xla(rng):
    """Commuted Hankel-operand kernel (B <= 8 latency path): the circulant
    is built from the zero-padded DIGITS and contracted against the
    negacyclically extended BSK limb vectors — bit-exact vs the XLA scan."""
    from rs_tfhe_tpu.ops.pallas_blind_rotate import (
        fused_blind_rotate_small,
        prepare_bsk_vecs,
        small_eligible,
    )

    n0, n1 = KP.n0, KP.n1
    bsk = jnp.asarray(
        rng.integers(0, 1 << 32, (n0, 2 * KP.trgsw_lv1.l, 2, n1),
                     dtype=np.uint32)
    )
    tv = jnp.asarray(rng.integers(0, 1 << 32, (2, n1), dtype=np.uint32))
    vecs = prepare_bsk_vecs(bsk)
    for batch in (1, 3):
        ct = jnp.asarray(
            rng.integers(0, 1 << 32, (batch, n0 + 1), dtype=np.uint32)
        )
        ref = np.asarray(BR.blind_rotate(ct, tv, bsk, KP))
        b_til = ((2 * n1 - BR.modswitch(ct[:, n0], KP)) % (2 * n1)).astype(
            jnp.int32
        )
        a_til = BR.modswitch(ct[:, :n0], KP).T
        assert small_eligible(KP, batch, tv.ndim)
        got = fused_blind_rotate_small(
            b_til, a_til, tv, vecs, KP, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(got), ref)


def test_fused_blind_rotate_small_drop_limbs_and_per_ct_tv(rng):
    """Small kernel with the production flavors: 24-bit rounded BSK
    (drop_limbs=1) and per-ciphertext test vectors."""
    import dataclasses

    from rs_tfhe_tpu.key import round_bsk
    from rs_tfhe_tpu.ops.pallas_blind_rotate import (
        fused_blind_rotate_small,
        prepare_bsk_vecs,
    )

    kp = dataclasses.replace(KP, bsk_round_bits=8)
    batch, n0, n1 = 2, kp.n0, kp.n1
    bsk = round_bsk(
        jnp.asarray(
            rng.integers(0, 1 << 32, (n0, 2 * kp.trgsw_lv1.l, 2, n1),
                         dtype=np.uint32)
        ),
        kp.bsk_round_bits,
    )
    ct = jnp.asarray(rng.integers(0, 1 << 32, (batch, n0 + 1), dtype=np.uint32))
    tv = jnp.asarray(
        rng.integers(0, 1 << 32, (batch, 2, n1), dtype=np.uint32)
    )
    ref = np.asarray(BR.blind_rotate(ct, tv, bsk, kp))
    b_til = ((2 * n1 - BR.modswitch(ct[:, n0], kp)) % (2 * n1)).astype(
        jnp.int32
    )
    a_til = BR.modswitch(ct[:, :n0], kp).T
    got = fused_blind_rotate_small(
        b_til, a_til, tv, prepare_bsk_vecs(bsk, drop_limbs=1), kp,
        interpret=True, drop_limbs=1,
    )
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_fused_blind_rotate_small_mb_matches_xla(rng):
    """Multi-bit small kernel: the commuted form (one 4-pattern dot, then a
    per-row negacyclic barrel roll of the dot output) is bit-exact vs the
    XLA mb scan (word-domain combination, then one external product) —
    linearity + the [g,-g]x[d,0] anti-periodicity argument, verified."""
    from rs_tfhe_tpu.ops.blind_rotate import _mb_k_rows, blind_rotate_mb
    from rs_tfhe_tpu.ops.pallas_blind_rotate import (
        fused_blind_rotate_small_mb,
        mb_rows_per_pattern,
        mb_small_eligible,
        prepare_bsk_mb_vecs,
    )

    n0, n1 = KP.n0, KP.n1
    bsk_mb = jnp.asarray(
        rng.integers(
            0, 1 << 32, (n0 // 2, 4, 2 * KP.trgsw_lv1.l, 2, n1),
            dtype=np.uint32,
        )
    )
    tv = jnp.asarray(rng.integers(0, 1 << 32, (2, n1), dtype=np.uint32))
    vecs = prepare_bsk_mb_vecs(bsk_mb)
    rb = mb_rows_per_pattern(KP)
    for batch in (1, 2):
        ct = jnp.asarray(
            rng.integers(0, 1 << 32, (batch, n0 + 1), dtype=np.uint32)
        )
        ref = np.asarray(blind_rotate_mb(ct, tv, bsk_mb, KP))
        b_til = ((2 * n1 - BR.modswitch(ct[:, n0], KP)) % (2 * n1)).astype(
            jnp.int32
        )
        a_til = BR.modswitch(ct[:, :n0], KP)
        assert mb_small_eligible(KP, batch, tv.ndim)
        got = fused_blind_rotate_small_mb(
            b_til,
            _mb_k_rows(a_til[:, 0::2], a_til[:, 1::2], KP, rb),
            tv, vecs, KP, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got), ref)


def test_fused_blind_rotate_small_mb_drop_limbs_and_per_ct_tv(rng):
    """mb kernel production flavors: 24-bit rounded pattern TRGSWs
    (drop_limbs=1 — rounding survives both monomial rotation and the
    4-pattern sum, so the zero low limb plane stays exact) and
    per-ciphertext test vectors."""
    import dataclasses

    from rs_tfhe_tpu.key import round_bsk
    from rs_tfhe_tpu.ops.blind_rotate import _mb_k_rows, blind_rotate_mb
    from rs_tfhe_tpu.ops.pallas_blind_rotate import (
        fused_blind_rotate_small_mb,
        mb_rows_per_pattern,
        prepare_bsk_mb_vecs,
    )

    kp = dataclasses.replace(KP, bsk_round_bits=8)
    batch, n0, n1 = 2, kp.n0, kp.n1
    bsk_mb = round_bsk(
        jnp.asarray(
            rng.integers(
                0, 1 << 32, (n0 // 2, 4, 2 * kp.trgsw_lv1.l, 2, n1),
                dtype=np.uint32,
            )
        ),
        kp.bsk_round_bits,
    )
    ct = jnp.asarray(rng.integers(0, 1 << 32, (batch, n0 + 1), dtype=np.uint32))
    tv = jnp.asarray(rng.integers(0, 1 << 32, (batch, 2, n1), dtype=np.uint32))
    ref = np.asarray(blind_rotate_mb(ct, tv, bsk_mb, kp))
    b_til = ((2 * n1 - BR.modswitch(ct[:, n0], kp)) % (2 * n1)).astype(jnp.int32)
    a_til = BR.modswitch(ct[:, :n0], kp)
    got = fused_blind_rotate_small_mb(
        b_til,
        _mb_k_rows(a_til[:, 0::2], a_til[:, 1::2], kp,
                   mb_rows_per_pattern(kp, 1)),
        tv, prepare_bsk_mb_vecs(bsk_mb, drop_limbs=1), kp,
        interpret=True, drop_limbs=1,
    )
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_fused_blind_rotate_wide_tile_256(rng):
    """tile is a pure performance knob: tile=256 must match tile=128."""
    from rs_tfhe_tpu.ops.pallas_blind_rotate import fused_blind_rotate_wide

    batch, n0, n1 = 256, KP.n0, KP.n1
    bsk = jnp.asarray(
        rng.integers(0, 1 << 32, (n0, 2 * KP.trgsw_lv1.l, 2, n1),
                     dtype=np.uint32)
    )
    ct = jnp.asarray(rng.integers(0, 1 << 32, (batch, n0 + 1), dtype=np.uint32))
    tv = jnp.asarray(rng.integers(0, 1 << 32, (2, n1), dtype=np.uint32))
    b_til = ((2 * n1 - BR.modswitch(ct[:, n0], KP)) % (2 * n1)).astype(jnp.int32)
    a_til = BR.modswitch(ct[:, :n0], KP).T
    packed = prepare_bsk_limbs(bsk)
    ref = np.asarray(
        fused_blind_rotate_wide(b_til, a_til, tv, packed, KP, interpret=True,
                                super_b=256)
    )
    got = fused_blind_rotate_wide(
        b_til, a_til, tv, packed, KP, interpret=True, super_b=256, tile=256
    )
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_cloudkey_precomputes_bsk_vecs():
    """CloudKey.generate populates bsk_vecs for small-kernel-eligible sets
    and it matches a fresh prepare_bsk_vecs of the same BSK."""
    from rs_tfhe_tpu.key import CloudKey, SecretKey
    from rs_tfhe_tpu.ops.pallas_blind_rotate import prepare_bsk_vecs

    sk = SecretKey.generate(jax.random.key(11), KP)
    ck = CloudKey.generate(jax.random.key(12), sk)
    assert ck.bsk_vecs is not None
    np.testing.assert_array_equal(
        np.asarray(ck.bsk_vecs), np.asarray(prepare_bsk_vecs(ck.bsk))
    )


def test_cloudkey_precomputes_bsk_mb_vecs():
    """CloudKey.generate(multibit=True) populates bsk_mb_vecs for
    kernel-eligible sets, matching a fresh prepare_bsk_mb_vecs."""
    from rs_tfhe_tpu.key import CloudKey, SecretKey
    from rs_tfhe_tpu.ops.pallas_blind_rotate import prepare_bsk_mb_vecs

    sk = SecretKey.generate(jax.random.key(11), KP)
    ck = CloudKey.generate(jax.random.key(12), sk, multibit=True)
    assert ck.bsk_mb_vecs is not None
    np.testing.assert_array_equal(
        np.asarray(ck.bsk_mb_vecs), np.asarray(prepare_bsk_mb_vecs(ck.bsk_mb))
    )


def test_wide_eligibility_is_the_measured_crossover():
    """The wide kernel's scratch cap is a measured performance crossover
    (v5e, 2026-08): UINT sets (16 MB) and FAST (24 MB) win wide, UINT1
    (32 MB) and the L=3 boolean sets (48 MB) run 1.1-1.5x faster on the
    per-tile kernel — NOTES-PERF.md round-4 findings. Guard the routing."""
    import rs_tfhe_tpu as tfhe
    from rs_tfhe_tpu.ops.pallas_blind_rotate import wide_eligible

    def drop(p):
        return p.bsk_round_bits // 8

    for p in (tfhe.SECURITY_128_BIT_FAST, tfhe.SECURITY_UINT4):
        assert wide_eligible(p, 4096, 2, drop(p)), p.description
    for p in (tfhe.SECURITY_80_BIT, tfhe.SECURITY_110_BIT,
              tfhe.SECURITY_128_BIT, tfhe.SECURITY_UINT1):
        assert not wide_eligible(p, 4096, 2, drop(p)), p.description


def test_fused_blind_rotate_wide_joint_rot_matches(rng):
    """joint_rot=True (both polys rotated + decomposed as one [2*tile, N]
    value — the round-5 VPU-shrink A/B) is bit-exact vs the default."""
    from rs_tfhe_tpu.ops.pallas_blind_rotate import fused_blind_rotate_wide

    batch, n0, n1 = 256, KP.n0, KP.n1
    bsk = jnp.asarray(
        rng.integers(0, 1 << 32, (n0, 2 * KP.trgsw_lv1.l, 2, n1), dtype=np.uint32)
    )
    ct = jnp.asarray(rng.integers(0, 1 << 32, (batch, n0 + 1), dtype=np.uint32))
    tv = jnp.asarray(rng.integers(0, 1 << 32, (2, n1), dtype=np.uint32))

    b_til = ((2 * n1 - BR.modswitch(ct[:, n0], KP)) % (2 * n1)).astype(jnp.int32)
    a_til = BR.modswitch(ct[:, :n0], KP).T
    packed = prepare_bsk_limbs(bsk)
    ref = np.asarray(fused_blind_rotate_wide(
        b_til, a_til, tv, packed, KP, interpret=True, super_b=256))
    got = fused_blind_rotate_wide(
        b_til, a_til, tv, packed, KP, interpret=True, super_b=256,
        joint_rot=True,
    )
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_fused_blind_rotate_tile_joint_rot_matches(rng):
    """Per-tile kernel joint_rot variant is bit-exact vs the default."""
    batch, n0, n1 = 128, KP.n0, KP.n1
    bsk = jnp.asarray(
        rng.integers(0, 1 << 32, (n0, 2 * KP.trgsw_lv1.l, 2, n1), dtype=np.uint32)
    )
    ct = jnp.asarray(rng.integers(0, 1 << 32, (batch, n0 + 1), dtype=np.uint32))
    tv = jnp.asarray(rng.integers(0, 1 << 32, (2, n1), dtype=np.uint32))

    b_til = ((2 * n1 - BR.modswitch(ct[:, n0], KP)) % (2 * n1)).astype(jnp.int32)
    a_til = BR.modswitch(ct[:, :n0], KP).T
    packed = prepare_bsk_limbs(bsk)
    ref = np.asarray(
        fused_blind_rotate(b_til, a_til, tv, packed, KP, interpret=True))
    got = fused_blind_rotate(
        b_til, a_til, tv, packed, KP, interpret=True, joint_rot=True)
    np.testing.assert_array_equal(np.asarray(got), ref)
