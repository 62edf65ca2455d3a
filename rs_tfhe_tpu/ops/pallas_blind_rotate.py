"""Whole-blind-rotation Pallas kernel: the bootstrap hot loop in VMEM.

One `pallas_call` runs all n0 CMUX steps (reference rs-tfhe trgsw.rs:198-226)
for a tile of the ciphertext batch, with the TRLWE accumulator RESIDENT IN
VMEM across grid steps — the output block's index map is constant in the step
dimension, so Pallas keeps it on-chip and flushes once per batch tile:

  grid = (batch_tiles, n0)     # step minor => acc block stays in VMEM
  per (ft, step):
    step == 0:  acc := X^{b~} * testvec        (barrel rotator, VPU)
    rot   = X^{a~_step} * acc                  (barrel rotator, VPU)
    lhs   = gadget_decompose(rot - acc)        (shifts/masks, VPU)
    delta = sum_j lhs_j (*) bsk[step, j]       (circulant built by log-
                                                doubling rolls, int8 MXU dots)
    acc  += delta

HBM traffic for a whole bootstrap batch tile: stream the limb-split BSK
(~68 MB at SECURITY_128_BIT, double-buffered by the Pallas pipeline) plus one
accumulator write — versus ~100 MB *per step* for the unfused path.

Eligibility: N % 128 == 0 and batch % tile == 0 (shared or per-ciphertext
test vectors; single- or multi-limb digits). Other shapes fall back to
ops/blind_rotate.py's XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import TORUS_BITS, TfheParams
from ..torus import split_u32_limbs
from .poly import negacyclic_extend

_FB = 128  # batch-tile rows per program (256 OOMs VMEM once the out block
#            double-buffers across batch tiles)


def _neg_u32(x):
    return jnp.zeros_like(x) - x


def _barrel_rotate_2d(x: jax.Array, k: jax.Array, n: int) -> jax.Array:
    """out[b, c] = x_ext[b, (c - k[b]) mod 2N] for x [FB, N], k int32 [FB, 1]:
    log2(2N) stages of static negacyclic roll under per-batch bit selects
    (all VPU, 2-D shapes only — Mosaic-friendly)."""
    nbits = int(n * 2 - 1).bit_length()
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for i in range(nbits):
        s = 1 << i
        if s >= n:
            rolled = _neg_u32(x) if s == n else x  # X^N = -1; s == 2N never hit
        else:
            r = pltpu.roll(x, s, axis=1)
            rolled = jnp.where(col < s, _neg_u32(r), r)
        bit = (k >> i) & 1  # [FB, 1], broadcasts over columns
        x = jnp.where(bit == 1, rolled, x)
    return x


def _decompose_i8(diffs, params: TfheParams) -> list[list[jax.Array]]:
    """diffs: pair of uint32 [FB, N] -> 2L rows of digit_limbs int8 [FB, N]
    planes, TRGSW row order (a-poly digits then b-poly digits, reference
    trgsw.rs:158-168). For bgbit <= 8 each digit is one int8 plane; wider
    gadgets (the Uint sets, bgbit up to 23) split each digit into balanced
    signed base-256 limbs so the MXU contraction stays int8-exact. Planes
    are kept separate — the dots consume them per (row, digit-limb)."""
    g = params.trgsw_lv1
    mask = jnp.uint32(g.bg - 1)
    half = jnp.int32(g.half_bg)
    dl_count = params.digit_limbs
    offset = jnp.uint32(
        (params.decomposition_offset + params.decomposition_round_bit)
        & 0xFFFFFFFF
    )
    rows = []
    for poly in range(2):
        tmp = diffs[poly] + offset
        for i in range(g.l):
            shift = jnp.uint32(TORUS_BITS - (i + 1) * g.bgbit)
            d = ((tmp >> shift) & mask).astype(jnp.int32) - half
            if dl_count == 1:
                rows.append([d.astype(jnp.int8)])
            else:
                limbs = []
                rem = d
                for _ in range(dl_count):
                    low = ((rem + jnp.int32(128)) & jnp.int32(255)) - jnp.int32(128)
                    limbs.append(low.astype(jnp.int8))
                    rem = jax.lax.shift_right_arithmetic(rem - low, jnp.int32(8))
                rows.append(limbs)
    return rows


def _build_w_packed(x: jax.Array, blk: int) -> jax.Array:
    """W[mi, c] = x[(c - mi) mod 2N] by log-doubling rolls on BYTE-PACKED
    limbs: x is int32 with the 4 balanced int8 limb planes packed per
    coefficient (prepare_bsk_limbs), so one int32 roll chain moves all four
    planes at once — Mosaic rejects int8 rotates, and this recovers the 4x
    traffic the int32 widening would otherwise cost. Limb q is recovered
    with (w << (24-8q)) >> 24 (arithmetic)."""
    w = x[None, :]
    k = 1
    while k < blk:
        w = jnp.concatenate([w, pltpu.roll(w, k, axis=1)], axis=0)
        k *= 2
    return w


def _build_w_packed_all(x: jax.Array, blk: int) -> jax.Array:
    """Joint roll chain for ALL 2L*2 packed step polys at once:
    x int32 [R, 2N] -> [R, blk, 2N] with out[r, mi, c] = x[r, (c - mi)].
    Same bytes as R separate chains but log2(blk) LARGE VPU ops instead of
    R*log2(blk) small ones (VPU efficiency rises with op size)."""
    w = x[:, None, :]
    k = 1
    while k < blk:
        w = jnp.concatenate([w, pltpu.roll(w, k, axis=2)], axis=1)
        k *= 2
    return w


def _joint_rotate_decompose(acc, a_k, params: TfheParams, rows: int, n: int):
    """Rotate + gadget-decompose BOTH accumulator polys as ONE [2*rows, N]
    value: half the VPU op count at double the op size (measured +2.5%
    end-to-end rotation rate on v5e at B=4096 — LATENCY/joint A/B,
    NOTES-PERF round 5). Single-limb digits only. Returns `planes` in
    _decompose_i8's row order."""
    g = params.trgsw_lv1
    acc2 = jnp.concatenate(acc, axis=0)  # [2*rows, N]
    k2 = jnp.concatenate([a_k, a_k], axis=0)
    diff2 = _barrel_rotate_2d(acc2, k2, n) - acc2
    offset = jnp.uint32(
        (params.decomposition_offset + params.decomposition_round_bit)
        & 0xFFFFFFFF
    )
    tmp2 = diff2 + offset
    mask = jnp.uint32(g.bg - 1)
    half = jnp.int32(g.half_bg)
    planes = [None] * (2 * g.l)
    for i in range(g.l):
        shift = jnp.uint32(TORUS_BITS - (i + 1) * g.bgbit)
        d8 = (((tmp2 >> shift) & mask).astype(jnp.int32) - half).astype(
            jnp.int8
        )
        for poly in range(2):
            planes[poly * g.l + i] = [
                jax.lax.slice(d8, (poly * rows, 0), (poly * rows + rows, n))
            ]
    return planes


def _kernel(
    tv_ref, btil_ref, atil_ref, bsk_ref, out_ref, *, params: TfheParams,
    per_ct_tv: bool = False, drop_limbs: int = 0, fb: int = _FB,
    col_chunk: int | None = None, joint_rot: bool = False,
):
    n = params.n1
    g = params.trgsw_lv1
    j_rows = 2 * g.l
    two_n = 2 * n
    step = pl.program_id(1)

    b_k = btil_ref[0, :, :]  # [FB, 1] int32

    @pl.when(step == 0)
    def _init():
        for poly in range(2):
            if per_ct_tv:
                tv = tv_ref[:, poly, :]  # [FB, N] per-ciphertext LUTs
            else:
                tv = jnp.broadcast_to(tv_ref[poly, :][None, :], (fb, n))
            out_ref[:, poly, :] = _barrel_rotate_2d(tv, b_k, n)

    a_k = atil_ref[0, :, :]  # [FB, 1] int32
    acc = [out_ref[:, poly, :] for poly in range(2)]
    if joint_rot:
        planes = _joint_rotate_decompose(acc, a_k, params, fb, n)
    else:
        diffs = [
            _barrel_rotate_2d(acc[poly], a_k, n) - acc[poly]
            for poly in range(2)
        ]
        planes = _decompose_i8(diffs, params)  # 2L x int8 [FB, N]

    # ONE joint roll chain for every (o, j) packed step poly (the 4 int8
    # limb planes travel inside each int32 word; Mosaic rejects int8
    # rotates): log2(128) large VPU ops replace 2*2L small chains. At
    # N > 2048 the joint chain (2*2L * 128 * 2N i32) would exceed VMEM —
    # fall back to per-(o, j) chains there.
    joint_chain = n <= 2048
    if joint_chain:
        wp_all = _build_w_packed_all(
            bsk_ref[0].reshape(2 * j_rows, two_n), 128
        )  # [2*2L, 128, 2N] i32

    # Output columns split into <= 1024-wide chunks so the materialized
    # circulant slice stays <= 4 MB: at N = 4096 (SECURITY_128_BIT_NIBBLE)
    # a full [N, N] int8 operand alone is 16 MB and OOMs Mosaic (measured).
    cc = min(n, 1024) if col_chunk is None else col_chunk
    n_chunks = n // cc

    dl_count = params.digit_limbs
    for o in range(2):
        # acc_s[s][ch] accumulates every (digit-limb dl, BSK-limb q)
        # product with dl + q == s for output-column chunk ch; s >= 4
        # shifts past 2^32 and vanishes, which is why 3-limb digits cost
        # 9 dots per (o, j), not 12. Chunk accumulators stay separate SSA
        # values (registers), concatenated once at the end.
        acc_s = [
            [jnp.zeros((fb, cc), dtype=jnp.int32) for _ in range(n_chunks)]
            for _ in range(4)
        ]
        for j in range(j_rows):
            if joint_chain:
                wp = wp_all[o * j_rows + j]  # [128, 2N] i32
            else:
                wp = _build_w_packed(bsk_ref[0, o, j, :], 128)
            # drop_limbs > 0: the BSK is a reduced-modulus key (low bytes
            # zero — grid-sampled mask + rounded body, key.py), so the low
            # limb planes are identically zero and their MXU dots are
            # skipped — 25% fewer MACs at drop_limbs=1 with noise far below
            # the decryption margin (utils/noise.py models the term).
            # q starts at drop_limbs (zero limb planes skipped); limb pairs
            # with q + dl > 3 are skipped at the inner `s > 3` check below.
            for q in range(drop_limbs, 4):
                wq = jax.lax.shift_right_arithmetic(
                    jnp.left_shift(wp, jnp.int32(24 - 8 * q)), jnp.int32(24)
                ).astype(jnp.int8)  # [128, 2N]
                w2 = jnp.concatenate([wq, wq], axis=1)  # [128, 4N]
                for ch in range(n_chunks):
                    c0 = ch * cc
                    rhs = jnp.concatenate(
                        [
                            jax.lax.slice(
                                w2,
                                (0, two_n - 128 * u + c0),
                                (128, two_n - 128 * u + c0 + cc),
                            )
                            for u in range(n // 128)
                        ],
                        axis=0,
                    )  # [N, cc]
                    for dl in range(dl_count):
                        s = q + dl
                        if s > 3:
                            continue
                        acc_s[s][ch] += jax.lax.dot_general(
                            planes[j][dl],
                            rhs,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        )
        uacc = jnp.zeros((fb, n), dtype=jnp.uint32)
        for s in range(drop_limbs, 4):
            shift = 8 * s
            if shift < TORUS_BITS:
                full = (
                    acc_s[s][0]
                    if n_chunks == 1
                    else jnp.concatenate(acc_s[s], axis=1)
                )
                uacc = uacc + (
                    jax.lax.bitcast_convert_type(full, jnp.uint32)
                    << jnp.uint32(shift)
                )
        out_ref[:, o, :] = acc[o] + uacc


def _kernel_wide(
    tv_ref, btil_ref, atil_ref, bsk_ref, out_ref, *rhs_refs,
    params: TfheParams, per_ct_tv: bool = False, drop_limbs: int = 0,
    tile: int = _FB, joint_rot: bool = False,
):
    """Step-major variant: grid = (batch_supers, n0, batch_tiles) with the
    WHOLE super-batch accumulator resident in VMEM. The per-step circulant
    build (the roll chains + rhs materialization, the kernel's whole VPU
    cost apart from rotate/decompose) runs ONCE per step — at ft == 0 it is
    written into persistent VMEM scratch — instead of once per 128-row
    batch tile as in `_kernel` (16-32x redundant at production batches).
    The (o, j) structure folds into the matmul itself: the 2L digit planes
    concatenate along K and both output polys along N, so each live BSK
    limb q is ONE [tile, 2L*N] x [2L*N, 2N] int8 dot."""
    n = params.n1
    g = params.trgsw_lv1
    j_rows = 2 * g.l
    two_n = 2 * n
    st = pl.program_id(1)
    ft = pl.program_id(2)
    t0 = ft * tile

    q_list = list(range(drop_limbs, 4))
    dl_count = params.digit_limbs

    @pl.when(ft == 0)
    def _build():
        # rhs_refs[qi][j*N + k, o*N + c] = limb_q(bsk[st, o, j])_ext[(c-k) mod 2N]
        wp_all = _build_w_packed_all(
            bsk_ref[0].reshape(2 * j_rows, two_n), 128
        )  # [2*2L, 128, 2N] i32
        for qi, q in enumerate(q_list):
            wq = jax.lax.shift_right_arithmetic(
                jnp.left_shift(wp_all, jnp.int32(24 - 8 * q)), jnp.int32(24)
            ).astype(jnp.int8)  # [2*2L, 128, 2N]
            for o in range(2):
                for j in range(j_rows):
                    w2 = jnp.concatenate(
                        [wq[o * j_rows + j], wq[o * j_rows + j]], axis=1
                    )  # [128, 4N]
                    for u in range(n // 128):
                        rhs_refs[qi][
                            pl.ds(j * n + 128 * u, 128), pl.ds(o * n, n)
                        ] = jax.lax.slice(
                            w2, (0, two_n - 128 * u), (128, two_n - 128 * u + n)
                        )

    b_k = btil_ref[0, pl.ds(t0, tile), :]  # [tile, 1] int32

    @pl.when(st == 0)
    def _init():
        for poly in range(2):
            if per_ct_tv:
                tv = tv_ref[pl.ds(t0, tile), poly, :]
            else:
                tv = jnp.broadcast_to(tv_ref[poly, :][None, :], (tile, n))
            out_ref[pl.ds(t0, tile), poly, :] = _barrel_rotate_2d(tv, b_k, n)

    a_k = atil_ref[0, pl.ds(t0, tile), :]  # [tile, 1] int32
    acc = [out_ref[pl.ds(t0, tile), poly, :] for poly in range(2)]
    if joint_rot:
        planes = _joint_rotate_decompose(acc, a_k, params, tile, n)
    else:
        diffs = [
            _barrel_rotate_2d(acc[poly], a_k, n) - acc[poly]
            for poly in range(2)
        ]
        planes = _decompose_i8(diffs, params)  # 2L rows x dl [tile, N] i8

    # K-concat the 2L rows per digit-limb: one wide lhs per dl
    lhs = [
        jnp.concatenate([planes[j][dl] for j in range(j_rows)], axis=1)
        for dl in range(dl_count)
    ]  # dl x [tile, 2L*N]

    acc_s = {}
    for qi, q in enumerate(q_list):
        rhs = rhs_refs[qi][:, :]  # [2L*N, 2N]
        for dl in range(dl_count):
            s = q + dl
            if s > 3:
                continue
            d = jax.lax.dot_general(
                lhs[dl], rhs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [tile, 2N]
            acc_s[s] = acc_s.get(s, 0) + d

    for o in range(2):
        uacc = jnp.zeros((tile, n), dtype=jnp.uint32)
        for s, v in acc_s.items():
            shift = 8 * s
            if shift < TORUS_BITS:
                uacc = uacc + (
                    jax.lax.bitcast_convert_type(
                        jax.lax.slice(v, (0, o * n), (tile, o * n + n)),
                        jnp.uint32,
                    )
                    << jnp.uint32(shift)
                )
        out_ref[pl.ds(t0, tile), o, :] = acc[o] + uacc


def _pack_digit_chain(planes, batch: int, n: int, j_rows: int) -> jax.Array:
    """Byte-pack up to 4 digit planes per int32 word, zero-pad to 2N, and run
    ONE joint roll chain for EVERY (ciphertext, word) at once (log2(128)
    large VPU ops instead of batch*n_words small chains). The pack runs
    whole-batch 2-D (no per-row extracts: a 1-row slice at sublane offset
    b >= 1 crashes Mosaic layout inference on (1, 128)-tiled values —
    measured at batch = 2). Returns [batch*n_words, 128, 2N] i32 with
    out[b*n_words + w, mi, c] = packed_digits[b, w, (c - mi) mod 2N]."""
    two_n = 2 * n
    n_words = (j_rows + 3) // 4
    word_rows = []  # n_words x [batch, 2N] i32
    for w_i in range(n_words):
        js = range(4 * w_i, min(4 * w_i + 4, j_rows))
        word = jnp.zeros((batch, n), dtype=jnp.uint32)
        for slot, j in enumerate(js):
            byte = jax.lax.bitcast_convert_type(
                planes[j][0], jnp.uint8
            ).astype(jnp.uint32)
            word = word | (byte << jnp.uint32(8 * slot))
        word_rows.append(jnp.concatenate([
            jax.lax.bitcast_convert_type(word, jnp.int32),
            jnp.zeros((batch, n), jnp.int32),
        ], axis=1))
    # [batch, n_words, 2N] -> row index b*n_words + w_i (leading dims are
    # untiled, so the merge is layout-free)
    stacked = jnp.stack(word_rows, axis=1).reshape(batch * n_words, two_n)
    return _build_w_packed_all(stacked, 128)


def _write_dig_scratch(dig_ref, wch_all, b: int, n: int, j_rows: int) -> None:
    """Unpack ciphertext b's rolled digit words into the [2L*2N, N] int8
    zero-padded-circulant scratch: dig[j*2N + k', c] = Dzp_j[(c - k') mod 2N]."""
    two_n = 2 * n
    n_words = (j_rows + 3) // 4
    for w_i in range(n_words):
        js = range(4 * w_i, min(4 * w_i + 4, j_rows))
        wch = wch_all[b * n_words + w_i]  # [128, 2N] i32
        w2 = jnp.concatenate([wch, wch], axis=1)  # [128, 4N]
        for u in range(two_n // 128):
            blkc = jax.lax.slice(
                w2, (0, two_n - 128 * u), (128, two_n - 128 * u + n)
            )  # [128, N] i32 packed
            for slot, j in enumerate(js):
                dig_ref[pl.ds(j * two_n + 128 * u, 128), :] = (
                    jax.lax.shift_right_arithmetic(
                        jnp.left_shift(blkc, jnp.int32(24 - 8 * slot)),
                        jnp.int32(24),
                    ).astype(jnp.int8)
                )


def _kernel_small(
    tv_ref, btil_ref, atil_ref, bskvec_ref, out_ref, dig_ref, *,
    params: TfheParams, per_ct_tv: bool = False, drop_limbs: int = 0,
    batch: int = 1,
):
    """Commuted Hankel-operand kernel for tiny batches (B=1 latency): the
    circulant is built from the DIGITS (2L planes per ciphertext, byte-
    packed into ceil(2L/4) roll chains) instead of from the BSK (2*2L
    packed chains in `_kernel`) — at small fb the per-step cost is VPU-
    build-bound, so halving the build halves the step.

    The digit circulant is ZERO-PADDED to 2N and contracted against the
    negacyclically EXTENDED BSK limb vectors ([g, -g], precomputed at
    keygen by prepare_bsk_vecs):

        out[c] = sum_{k<2N} g_ext[k] * Dzp[(c - k) mod 2N],
        Dzp = [digits, 0]

    which equals the negacyclic product sum_j d_j (*) g_j exactly — the
    usual [d, -d] extension would need -digit, and -(-half_bg) overflows
    int8 (the BSK side dodges this by negating mod 2^32 BEFORE limb
    splitting; digits are created signed, so the zero-pad identity is the
    exact-preserving form). 2x nominal MACs, but the dot here is a tiny
    fraction of the step (M = 2*(4-drop_limbs) rows).
    """
    n = params.n1
    g = params.trgsw_lv1
    j_rows = 2 * g.l
    step = pl.program_id(0)
    n_q = 4 - drop_limbs

    b_k = btil_ref[0, :, :]  # [B, 1] int32

    @pl.when(step == 0)
    def _init():
        for poly in range(2):
            if per_ct_tv:
                tv = tv_ref[:, poly, :]
            else:
                tv = jnp.broadcast_to(tv_ref[poly, :][None, :], (batch, n))
            out_ref[:, poly, :] = _barrel_rotate_2d(tv, b_k, n)

    a_k = atil_ref[0, :, :]  # [B, 1] int32
    acc = [out_ref[:, poly, :] for poly in range(2)]
    diffs = [
        _barrel_rotate_2d(acc[poly], a_k, n) - acc[poly] for poly in range(2)
    ]
    planes = _decompose_i8(diffs, params)  # 2L x [dl=1] x [B, N] i8

    lhs = bskvec_ref[0]  # [2*n_q, 2L*2N] i8
    wch_all = _pack_digit_chain(planes, batch, n, j_rows)

    uaccs = [[None, None] for _ in range(batch)]
    for b in range(batch):
        _write_dig_scratch(dig_ref, wch_all, b, n, j_rows)
        res = jax.lax.dot_general(
            lhs, dig_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [2*n_q, N]
        for o in range(2):
            uacc = jnp.zeros((1, n), dtype=jnp.uint32)
            for qi in range(n_q):
                q = drop_limbs + qi
                shift = 8 * q
                if shift < TORUS_BITS:
                    row = jax.lax.slice(res, (o * n_q + qi, 0),
                                        (o * n_q + qi + 1, n))
                    uacc = uacc + (
                        jax.lax.bitcast_convert_type(row, jnp.uint32)
                        << jnp.uint32(shift)
                    )
            uaccs[b][o] = uacc
    # single full-block write per poly (offset row writes into out_ref hit
    # the same Mosaic layout-inference crash as the build's row extracts)
    for o in range(2):
        full = (
            uaccs[0][o]
            if batch == 1
            else jnp.concatenate([uaccs[b][o] for b in range(batch)], axis=0)
        )
        out_ref[:, o, :] = acc[o] + full


def prepare_bsk_vecs(bsk: jax.Array, drop_limbs: int = 0) -> jax.Array:
    """uint32 [n0, 2L, 2, N] -> int8 [n0, 2*(4-drop), 2L*2N]: the
    negacyclically extended balanced int8 limb planes laid out as flat
    contraction vectors for the commuted small-batch kernel. Row index is
    o * n_q + qi with q = drop_limbs + qi."""
    xl = split_u32_limbs(negacyclic_extend(bsk))  # [n0, 2L, 2, 2N, 4] i8
    xl = xl[..., drop_limbs:]  # live limbs only
    # -> [n0, 2(o), 4-drop(q), 2L, 2N]
    xl = jnp.transpose(xl, (0, 2, 4, 1, 3))
    n0, _, n_q, j_rows, two_n = xl.shape
    return xl.reshape(n0, 2 * n_q, j_rows * two_n)


def small_param_ok(params: TfheParams) -> bool:
    """Parameter-set (batch-independent) half of `small_eligible` — gates
    whether CloudKey.generate precomputes `bsk_vecs` for the set."""
    return (
        params.n1 % 128 == 0
        and params.n1 <= 4096
        and params.digit_limbs == 1
    )


def small_eligible(params: TfheParams, batch: int, testvec_ndim: int) -> bool:
    """The commuted kernel loops the per-ciphertext build serially — only a
    latency play. Digit planes must be single-limb (bgbit <= 8)."""
    return (
        small_param_ok(params)
        and 1 <= batch <= 8
        and testvec_ndim in (2, 3)
    )


def _kernel_small_mb(
    tv_ref, btil_ref, krows_ref, mbvec_ref, out_ref, dig_ref, *,
    params: TfheParams, per_ct_tv: bool = False, drop_limbs: int = 0,
    batch: int = 1,
):
    """Multi-bit (pair-grouped) variant of `_kernel_small`: n0/2 grid steps,
    each a full external product  acc <- Dec(acc) ⊡ comb  against the
    word-domain combination of the four pair-indicator TRGSWs
    (key.gen_bootstrapping_key_mb)

        comb = G_00 + X^{a1} G_10 + X^{a2} G_01 + X^{a1+a2} G_11.

    The monomial rotations are COMMUTED PAST THE DOT: (X^k G) ⊛ D =
    X^k (G ⊛ D), so the BSK pattern vectors stay static (precomputed,
    prepare_bsk_mb_vecs) and one [4*RB, 2L*2N] x [2L*2N, N] dot yields all
    four products at once; each X^{k_v} is then a per-row NEGACYCLIC barrel
    roll of the dot output (exact: the 2N-cyclic product of [g, -g] with
    zero-padded digits is anti-periodic, so its low half IS the negacyclic
    product and `_barrel_rotate_2d` realizes any X^k on it). Rotation is a
    signed permutation, so it commutes with the per-limb <<8q recombination
    mod 2^32 — bit-exact vs ops/blind_rotate.blind_rotate_mb's XLA path.

    Per group this costs ONE digit-circulant build (the dominant VPU cost at
    tiny batches) where the bit-serial chain pays TWO — the latency lever.
    The dot is 4x the per-step MACs (4 patterns, same K, half the steps =
    2x per rotation), cheap at B <= 2 where the MXU idles.
    """
    n = params.n1
    g = params.trgsw_lv1
    j_rows = 2 * g.l
    step = pl.program_id(0)
    n_q = 4 - drop_limbs
    rb = mb_rows_per_pattern(params, drop_limbs)  # = 2*n_q, no padding

    b_k = btil_ref[0, :, :]  # [B, 1] int32

    @pl.when(step == 0)
    def _init():
        for poly in range(2):
            if per_ct_tv:
                tv = tv_ref[:, poly, :]
            else:
                tv = jnp.broadcast_to(tv_ref[poly, :][None, :], (batch, n))
            out_ref[:, poly, :] = _barrel_rotate_2d(tv, b_k, n)

    acc = [out_ref[:, poly, :] for poly in range(2)]
    planes = _decompose_i8(acc, params)  # 2L x [dl=1] x [B, N] i8 (FULL acc:
    #                                      replacement form, not CMUX diff)

    lhs = mbvec_ref[0]  # [4*RB, 2L*2N] i8, row v*RB + o*n_q + qi
    wch_all = _pack_digit_chain(planes, batch, n, j_rows)

    news = [[None, None] for _ in range(batch)]
    for b in range(batch):
        _write_dig_scratch(dig_ref, wch_all, b, n, j_rows)
        f = jax.lax.dot_general(
            lhs, dig_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [4*RB, N]: rows v*RB + o*n_q + qi = limb-q plane of D (*) G_v[o]
        rolled = _barrel_rotate_2d(f, krows_ref[0, b], n)  # X^{k_v} per row
        # v-sum folded into the limb recombination as 1-row slices of the
        # dot result (the proven-safe Mosaic pattern) — no 8-row padding of
        # the patterns, so the dot's M is exactly 4*2*n_q (25% fewer MACs
        # at n_q=3 than the padded block-slice form)
        for o in range(2):
            uacc = jnp.zeros((1, n), dtype=jnp.uint32)
            for qi in range(n_q):
                q = drop_limbs + qi
                shift = 8 * q
                if shift < TORUS_BITS:
                    row = None
                    for v in range(4):
                        r = jax.lax.slice(
                            rolled,
                            (v * rb + o * n_q + qi, 0),
                            (v * rb + o * n_q + qi + 1, n),
                        )
                        row = r if row is None else row + r
                    uacc = uacc + (
                        jax.lax.bitcast_convert_type(row, jnp.uint32)
                        << jnp.uint32(shift)
                    )
            news[b][o] = uacc
    for o in range(2):
        full = (
            news[0][o]
            if batch == 1
            else jnp.concatenate([news[b][o] for b in range(batch)], axis=0)
        )
        out_ref[:, o, :] = full  # replacement: acc ⊡ comb, no acc +


def mb_rows_per_pattern(params: TfheParams, drop_limbs: int = 0) -> int:
    """Dot-output rows per indicator pattern: one per (output poly, live
    BSK limb)."""
    return 2 * (4 - drop_limbs)


def prepare_bsk_mb_vecs(bsk_mb: jax.Array, drop_limbs: int = 0) -> jax.Array:
    """uint32 [G, 4, 2L, 2, N] (key.gen_bootstrapping_key_mb) -> int8
    [G, 4*2*n_q, 2L*2N]: per pattern, the prepare_bsk_vecs layout (extended
    limb planes as flat contraction vectors, row o*n_q + qi), patterns
    stacked along the row dim."""
    g_ct, four, j2, two, n = bsk_mb.shape
    flat = prepare_bsk_vecs(
        bsk_mb.reshape(g_ct * four, j2, two, n), drop_limbs
    )  # [G*4, 2*n_q, 2L*2N]
    return flat.reshape(g_ct, four * flat.shape[1], -1)


def mb_small_eligible(params: TfheParams, batch: int, testvec_ndim: int) -> bool:
    """Pair-grouping needs an even n0; otherwise the `small_eligible`
    envelope (per-ciphertext serial build: a latency play, B <= 8)."""
    return (
        small_param_ok(params)
        and params.n0 % 2 == 0
        and 1 <= batch <= 8
        and testvec_ndim in (2, 3)
    )


@functools.partial(
    jax.jit, static_argnames=("params", "interpret", "drop_limbs")
)
def fused_blind_rotate_small_mb(
    b_til: jax.Array,
    k_rows: jax.Array,
    testvec: jax.Array,
    bsk_mb_vecs: jax.Array,
    params: TfheParams,
    interpret: bool = False,
    drop_limbs: int = 0,
) -> jax.Array:
    """Multi-bit small-batch blind rotation. b_til: int32 [B]; k_rows:
    int32 [G, B, 4*RB, 1] per-row roll exponents (pattern-major, repeated
    RB times — ops/blind_rotate._mb_k_rows); bsk_mb_vecs:
    prepare_bsk_mb_vecs output. Returns uint32 [B, 2, N]."""
    groups = k_rows.shape[0]
    n = params.n1
    g = params.trgsw_lv1
    batch = b_til.shape[0]
    per_ct_tv = testvec.ndim == 3
    j_rows = 2 * g.l
    rb4 = 4 * mb_rows_per_pattern(params, drop_limbs)

    kernel = functools.partial(
        _kernel_small_mb, params=params, per_ct_tv=per_ct_tv,
        drop_limbs=drop_limbs, batch=batch,
    )
    tv_spec = (
        pl.BlockSpec((batch, 2, n), lambda st: (0, 0, 0),
                     memory_space=pltpu.VMEM)
        if per_ct_tv
        else pl.BlockSpec((2, n), lambda st: (0, 0), memory_space=pltpu.VMEM)
    )
    return pl.pallas_call(
        kernel,
        grid=(groups,),
        in_specs=[
            tv_spec,
            pl.BlockSpec((1, batch, 1), lambda st: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, batch, rb4, 1), lambda st: (st, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb4, j_rows * 2 * n),
                         lambda st: (st, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch, 2, n), lambda st: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 2, n), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((j_rows * 2 * n, n), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(testvec, b_til[None, :, None], k_rows, bsk_mb_vecs)


@functools.partial(
    jax.jit, static_argnames=("params", "interpret", "drop_limbs")
)
def fused_blind_rotate_small(
    b_til: jax.Array,
    a_til: jax.Array,
    testvec: jax.Array,
    bsk_vecs: jax.Array,
    params: TfheParams,
    interpret: bool = False,
    drop_limbs: int = 0,
) -> jax.Array:
    """Commuted Hankel-operand variant of `fused_blind_rotate` for B <= 8.
    Takes prepare_bsk_vecs output instead of prepare_bsk_limbs."""
    n0 = a_til.shape[0]
    n = params.n1
    g = params.trgsw_lv1
    batch = b_til.shape[0]
    per_ct_tv = testvec.ndim == 3
    j_rows = 2 * g.l
    n_q = 4 - drop_limbs

    kernel = functools.partial(
        _kernel_small, params=params, per_ct_tv=per_ct_tv,
        drop_limbs=drop_limbs, batch=batch,
    )
    tv_spec = (
        pl.BlockSpec((batch, 2, n), lambda st: (0, 0, 0),
                     memory_space=pltpu.VMEM)
        if per_ct_tv
        else pl.BlockSpec((2, n), lambda st: (0, 0), memory_space=pltpu.VMEM)
    )
    return pl.pallas_call(
        kernel,
        grid=(n0,),
        in_specs=[
            tv_spec,
            pl.BlockSpec((1, batch, 1), lambda st: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, batch, 1), lambda st: (st, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * n_q, j_rows * 2 * n),
                         lambda st: (st, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch, 2, n), lambda st: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 2, n), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((j_rows * 2 * n, n), jnp.int8)],
        # Unconditional: batch >= 8 exceeds the default 16 MB scoped-VMEM cap
        # even at N=1024 (measured 16.52 MB), and the raised cap is harmless
        # at every measured shape (NOTES-PERF N=4096 section).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(testvec, b_til[None, :, None], a_til[:, :, None], bsk_vecs)


def wide_scratch_bytes(params: TfheParams, drop_limbs: int = 0) -> int:
    """Persistent VMEM the wide kernel's rhs scratch needs."""
    g = params.trgsw_lv1
    n_q = 4 - drop_limbs
    return n_q * (2 * g.l * params.n1) * (2 * params.n1)


def wide_eligible(
    params: TfheParams, batch: int, testvec_ndim: int, drop_limbs: int = 0
) -> bool:
    """The step-major kernel pays a scratch build per (super, step); it wins
    when several 128-row tiles share it and the scratch + resident
    accumulator fit VMEM (v5e: 128 MB total, ~100 MB usable).

    The scratch cap is a measured CROSSOVER, not a fit limit: at 16 MB
    (UINT4) and 24 MB (FAST) the wide kernel beats the per-tile kernel
    (4.9k vs 4.5k / 8.1k vs 7.6k rot/s), but above that the resident
    scratch degrades double-buffering more than the shared build saves —
    at 32 MB (UINT1) wide runs 2 871 rot/s vs 3 227 per-tile, and at
    48 MB (SECURITY_128_BIT, L=3) 2 964 vs 4 503; the same VMEM cliff as
    tile=256 (v5e, B=2048/4096, 2026-08; super_b and tile sweeps do not
    recover it: 2 980 at super=4096, 3 514 at tile=256)."""
    return (
        params.n1 % 128 == 0
        and batch % _FB == 0
        and batch >= 2 * _FB  # 1 tile/super: no build sharing, use _kernel
        and testvec_ndim in (2, 3)
        and wide_scratch_bytes(params, drop_limbs) <= 28 * 1024 * 1024
    )


def select_super(params: TfheParams, batch: int, drop_limbs: int) -> int:
    """Super-batch rows resident per grid pass: as large as VMEM allows
    (fewer supers = fewer redundant scratch builds)."""
    budget = 96 * 1024 * 1024 - wide_scratch_bytes(params, drop_limbs)
    acc_bytes_per_row = 2 * params.n1 * 4
    sb = budget // (2 * acc_bytes_per_row)  # acc single + headroom for DMA
    sb = max(_FB, min(batch, (sb // _FB) * _FB))
    while batch % sb:
        sb -= _FB
    return sb


@functools.partial(
    jax.jit,
    static_argnames=("params", "interpret", "drop_limbs", "super_b", "tile",
                     "joint_rot"),
)
def fused_blind_rotate_wide(
    b_til: jax.Array,
    a_til: jax.Array,
    testvec: jax.Array,
    bsk_limbs: jax.Array,
    params: TfheParams,
    interpret: bool = False,
    drop_limbs: int = 0,
    super_b: int | None = None,
    tile: int = _FB,
    joint_rot: bool = False,
) -> jax.Array:
    """Step-major whole-batch-resident variant of `fused_blind_rotate` —
    same contract (see it for argument shapes), restricted to batches that
    are multiples of 128 with `wide_eligible` parameter shapes. `tile` is
    the per-program row count (the dots' M dimension) — a hardware tunable;
    128 is the measured default, 256 doubles MXU fill per dot at 2x the
    resident acc working set."""
    n0 = a_til.shape[0]
    n = params.n1
    g = params.trgsw_lv1
    batch = b_til.shape[0]
    sb = super_b or select_super(params, batch, drop_limbs)
    assert batch % sb == 0 and sb % tile == 0
    per_ct_tv = testvec.ndim == 3
    j_rows = 2 * g.l
    n_q = 4 - drop_limbs

    kernel = functools.partial(
        _kernel_wide, params=params, per_ct_tv=per_ct_tv,
        drop_limbs=drop_limbs, tile=tile,
        joint_rot=joint_rot and params.digit_limbs == 1,
    )
    tv_spec = (
        pl.BlockSpec((sb, 2, n), lambda bs, st, ft: (bs, 0, 0),
                     memory_space=pltpu.VMEM)
        if per_ct_tv
        else pl.BlockSpec((2, n), lambda bs, st, ft: (0, 0),
                          memory_space=pltpu.VMEM)
    )
    return pl.pallas_call(
        kernel,
        grid=(batch // sb, n0, sb // tile),
        in_specs=[
            tv_spec,
            pl.BlockSpec((1, sb, 1), lambda bs, st, ft: (0, bs, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sb, 1), lambda bs, st, ft: (st, bs, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, j_rows, 2 * n),
                         lambda bs, st, ft: (st, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sb, 2, n), lambda bs, st, ft: (bs, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 2, n), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((j_rows * n, 2 * n), jnp.int8) for _ in range(n_q)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )(testvec, b_til[None, :, None], a_til[:, :, None], bsk_limbs)


def eligible(
    params: TfheParams, batch: int, testvec_ndim: int, fb: int = _FB
) -> bool:
    # multi-limb digits (Uint sets, bgbit > 8) are handled in-kernel since
    # round 2: each digit splits into balanced int8 limbs and (dl, q) limb
    # pairs shifting past 2^32 are skipped
    return (
        params.n1 % 128 == 0
        and params.n1 <= 4096  # fb=128 works at every measured ring size
        #                        (N=4096 via 1024-wide rhs column chunks +
        #                        the raised scoped-VMEM cap, NOTES-PERF.md);
        #                        larger rings are simply unmeasured
        and batch % fb == 0
        and testvec_ndim in (2, 3)  # shared or per-ciphertext test vectors
    )


def prepare_bsk_limbs(bsk: jax.Array) -> jax.Array:
    """uint32 [n0, 2L, 2, N] -> int32 [n0, 2, 2L, 2N]: negacyclic extension,
    balanced int8 limb-split, limbs byte-packed back into one int32 word per
    coefficient (NOT the original u32 value — balanced limbs are signed)."""
    xl = split_u32_limbs(negacyclic_extend(bsk))  # [n0, 2L, 2, 2N, 4] int8
    u = jax.lax.bitcast_convert_type(xl, jnp.uint8).astype(jnp.uint32)
    packed = (
        u[..., 0] | (u[..., 1] << 8) | (u[..., 2] << 16) | (u[..., 3] << 24)
    )
    packed = jax.lax.bitcast_convert_type(packed, jnp.int32)
    return jnp.transpose(packed, (0, 2, 1, 3))  # [n0, 2, 2L, 2N]


@functools.partial(
    jax.jit,
    static_argnames=("params", "interpret", "drop_limbs", "fb", "col_chunk",
                     "joint_rot"),
)
def fused_blind_rotate(
    b_til: jax.Array,
    a_til: jax.Array,
    testvec: jax.Array,
    bsk_limbs: jax.Array,
    params: TfheParams,
    interpret: bool = False,
    drop_limbs: int = 0,
    fb: int = _FB,
    col_chunk: int | None = None,
    joint_rot: bool = False,
) -> jax.Array:
    """b_til: int32 [B]; a_til: int32 [n0, B]; testvec: uint32 [2, N]
    (shared) or [B, 2, N] (per-ciphertext LUTs); bsk_limbs: int32
    [n0, 2, 2L, 2N] byte-packed limbs (prepare_bsk_limbs). Returns the
    accumulator uint32 [B, 2, N] after all n0 CMUX steps. drop_limbs=d
    skips the d lowest int8 limb planes of the BSK — exact iff the BSK was
    rounded to 32-8*d bits (key.round_bsk)."""
    n0 = a_til.shape[0]
    n = params.n1
    g = params.trgsw_lv1
    batch = b_til.shape[0]
    assert batch % fb == 0
    per_ct_tv = testvec.ndim == 3

    kernel = functools.partial(
        _kernel, params=params, per_ct_tv=per_ct_tv, drop_limbs=drop_limbs,
        fb=fb, col_chunk=col_chunk,
        joint_rot=joint_rot and params.digit_limbs == 1,
    )
    tv_spec = (
        pl.BlockSpec((fb, 2, n), lambda ft, st: (ft, 0, 0), memory_space=pltpu.VMEM)
        if per_ct_tv
        else pl.BlockSpec((2, n), lambda ft, st: (0, 0), memory_space=pltpu.VMEM)
    )
    return pl.pallas_call(
        kernel,
        grid=(batch // fb, n0),
        in_specs=[
            tv_spec,
            pl.BlockSpec(
                (1, fb, 1), lambda ft, st: (0, ft, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, fb, 1), lambda ft, st: (st, ft, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 2, 2 * g.l, 2 * n),
                lambda ft, st: (st, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (fb, 2, n), lambda ft, st: (ft, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, 2, n), jnp.uint32),
        # N = 4096 (SECURITY_128_BIT_NIBBLE) peaks ~20-24 MB of scoped VMEM
        # (the 2N-wide packed roll chain + its doubling transients), and
        # large batch tiles grow the live set similarly; the compiler's
        # default scoped limit is 16 MB, the hardware has more — raise the
        # cap for the big shapes.
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if n > 1024 or fb > 128
            else None
        ),
        interpret=interpret,
    )(testvec, b_til[None, :, None], a_til[:, :, None], bsk_limbs)
