"""Numpy oracle implementing the reference's EXACT algorithms, quirks
included — the cross-check harness VERDICT.md asked for.

No cargo/rustc exists in this environment, so reference behavior cannot be
sampled by running rs-tfhe; instead this module re-implements, line for
line in exact integer arithmetic, the routines our implementation
deliberately deviates from:

  - truncating gadget decomposition  (/root/reference/src/trgsw.rs:144-171)
  - MAX - x negation in monomial rotation and sample extraction
    (trgsw.rs:307-330, trlwe.rs:106-136)
  - the lv0-width "hybrid" extract    (trlwe.rs:122-136)
  - identity key switching            (trgsw.rs:332-360)
  - the blind-rotation loop           (trgsw.rs:198-226)
  - the keyswitch-free MUX composition (gates.rs:157-183)

Polynomial products use the exact integer schoolbook (the limit the
reference's f64 FFT approximates to +/-1 ulp; its own tests use the same
oracle, fft/mod.rs:240-255). tests/test_reference_oracle.py proves each
documented deviation is the ONLY difference between our pipeline and this
oracle, and that the deviations leave decrypted results unchanged (except
the reference's MUX hybrid, which is shown to be broken).

Everything is plain numpy uint32 with wrapping arithmetic.
"""

from __future__ import annotations

import numpy as np

U32 = np.uint32
MASK32 = np.uint32(0xFFFFFFFF)


def _u32(x) -> np.ndarray:
    return np.asarray(x).astype(np.uint64).astype(np.uint32)


def neg_ref(x):
    """The reference's negation: Torus::MAX - x = -x - 1 (mod 2^32)."""
    return (np.uint32(0xFFFFFFFF) - np.asarray(x, np.uint32)).astype(np.uint32)


def neg_exact(x):
    """Exact negation -x mod 2^32 (what our implementation uses)."""
    return (np.uint32(0) - np.asarray(x, np.uint32)).astype(np.uint32)


def polymul_x_k(a: np.ndarray, k: int, neg=neg_ref) -> np.ndarray:
    """a(X) * X^k in Z[X]/(X^N+1), k in [0, 2N) (trgsw.rs:307-330)."""
    n = a.shape[-1]
    res = np.zeros_like(a)
    if k < n:
        if k:
            res[..., k:] = a[..., : n - k]
            res[..., :k] = neg(a[..., n - k :])
        else:
            res[...] = a
    else:
        kk = k - n
        res[..., kk:] = neg(a[..., : n - kk])
        res[..., :kk] = a[..., n - kk :]
    return res


def decomposition(ab: np.ndarray, params, centered: bool) -> np.ndarray:
    """Gadget decomposition of a TRLWE pair [2, N] -> int digits [2L, N].

    centered=False is the reference verbatim (trgsw.rs:144-171): add the
    offset, shift/mask, subtract Bg/2 — reconstruction error in
    (-2^(32-L*Bgbit), 0]. centered=True additionally adds the rounding
    half-step first (our params.decomposition_round_bit), centering the
    error in +/- 2^(32-L*Bgbit-1).
    """
    g = params.trgsw_lv1
    offset = np.uint32(params.decomposition_offset)
    if centered:
        offset = _u32(np.uint64(offset) + np.uint64(params.decomposition_round_bit))
    half = np.int64(g.half_bg)
    mask = np.uint32(g.bg - 1)
    out = []
    for poly in range(2):
        tmp = (ab[poly] + offset).astype(np.uint32)
        for i in range(g.l):
            shift = np.uint32(32 - (i + 1) * g.bgbit)
            d = ((tmp >> shift) & mask).astype(np.int64) - half
            out.append(d)
    # TRGSW row order: a-digits then b-digits (trgsw.rs:158-168)
    rows = out[: g.l] + out[g.l :]
    return np.stack(rows).astype(np.int64)


def negacyclic_mul_small(digits: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Exact schoolbook negacyclic product of small signed digits [N] with a
    torus polynomial [N], mod 2^32 (fft/mod.rs:240-255 semantics)."""
    n = poly.shape[-1]
    acc = np.zeros(n, dtype=np.uint64)
    p = poly.astype(np.uint64)
    for k in range(n):
        d = int(digits[k])
        if d == 0:
            continue
        du = np.uint64(d & 0xFFFFFFFF)
        # X^k * poly: wrap with negacyclic sign
        acc[k:] += du * p[: n - k]
        acc[:k] -= du * p[n - k :]
    return acc.astype(np.uint32)


def external_product(trgsw: np.ndarray, trlwe: np.ndarray, params,
                     centered: bool) -> np.ndarray:
    """TRGSW [2L, 2, N] (x) TRLWE [2, N] -> TRLWE [2, N], exact integers
    (the f64-FFT-free limit of trgsw.rs:77-116)."""
    digits = decomposition(trlwe, params, centered)  # [2L, N]
    out = np.zeros_like(trlwe)
    for o in range(2):
        acc = np.zeros(trlwe.shape[-1], dtype=np.uint32)
        for j in range(digits.shape[0]):
            acc = acc + negacyclic_mul_small(digits[j], trgsw[j, o])
        out[o] = acc
    return out


def cmux(c0: np.ndarray, c1: np.ndarray, cond: np.ndarray, params,
         centered: bool) -> np.ndarray:
    """c0 + cond (x) (c1 - c0) (trgsw.rs:174-196)."""
    return c0 + external_product(cond, (c1 - c0).astype(np.uint32), params, centered)


def modswitch(x, params) -> np.ndarray:
    nbit = params.trgsw_lv1.nbit
    rnd = np.uint32(1 << (32 - nbit - 2))
    return ((np.asarray(x, np.uint32) + rnd) >> np.uint32(32 - nbit - 1)).astype(
        np.int64
    )


def blind_rotate(ct: np.ndarray, testvec: np.ndarray, bsk: np.ndarray, params,
                 centered: bool, neg=neg_ref) -> np.ndarray:
    """The reference loop (trgsw.rs:198-226): modswitch, X^b~ testvec init,
    n0 sequential CMUXes each preceded by an X^a~ rotation."""
    n0, n1 = params.n0, params.n1
    b_til = int((2 * n1 - modswitch(ct[n0], params)) % (2 * n1))
    res = np.stack([polymul_x_k(testvec[0], b_til, neg),
                    polymul_x_k(testvec[1], b_til, neg)])
    for i in range(n0):
        a_til = int(modswitch(ct[i], params) % (2 * n1))
        res2 = np.stack([polymul_x_k(res[0], a_til, neg),
                         polymul_x_k(res[1], a_til, neg)])
        res = cmux(res, res2, bsk[i], params, centered)
    return res


def sample_extract(trlwe: np.ndarray, k: int = 0, neg=neg_ref,
                   width: int | None = None) -> np.ndarray:
    """trlwe.rs:106-120; width=n0 gives the index-arithmetic-with-n0
    "hybrid" variant sample_extract_index_2 (trlwe.rs:122-136)."""
    n = trlwe.shape[-1]
    w = n if width is None else width
    p = np.zeros(w + 1, dtype=np.uint32)
    for i in range(w):
        if i <= k:
            p[i] = trlwe[0, k - i]
        else:
            p[i] = neg(trlwe[0, w + k - i])
    p[w] = trlwe[1, k]
    return p


def identity_key_switching(src: np.ndarray, ksk_rows: np.ndarray, params
                           ) -> np.ndarray:
    """trgsw.rs:332-360: digit-decompose each lv1 mask coefficient, subtract
    the selected KSK rows. ksk_rows: uint32 [N*IKS_T*BASE, n0+1]."""
    g = params.trgsw_lv1
    n1, n0 = params.n1, params.n0
    t, bb = g.iks_t, g.basebit
    base = 1 << bb
    res = np.zeros(n0 + 1, dtype=np.uint32)
    res[n0] = src[n1]
    prec = np.uint32(1 << (32 - (1 + bb * t)))
    for i in range(n1):
        a_bar = np.uint32(src[i] + prec)
        for j in range(t):
            k = int((a_bar >> np.uint32(32 - (j + 1) * bb)) & np.uint32(base - 1))
            if k != 0:
                idx = base * t * i + base * j + k
                res = res - ksk_rows[idx]
    return res


def gate_bootstrap(ct: np.ndarray, testvec: np.ndarray, bsk: np.ndarray,
                   ksk_rows: np.ndarray, params, centered: bool, neg=neg_ref
                   ) -> np.ndarray:
    """Full reference bootstrap: rotate -> extract(0) -> key switch
    (bootstrap/vanilla.rs:40-52)."""
    acc = blind_rotate(ct, testvec, bsk, params, centered, neg)
    lv1 = sample_extract(acc, 0, neg)
    return identity_key_switching(lv1, ksk_rows, params)


def bootstrap_without_key_switch(ct, testvec, bsk, params, centered,
                                 neg=neg_ref) -> np.ndarray:
    """vanilla.rs:54-63: rotate -> hybrid lv0-width extract (the quirk)."""
    acc = blind_rotate(ct, testvec, bsk, params, centered, neg)
    return sample_extract(acc, 0, neg, width=params.n0)


def mux(a, b, c, testvec, bsk, ksk_rows, params, centered, neg=neg_ref,
        f64_to_torus_eighth=np.uint32(0x20000000)) -> np.ndarray:
    """The reference's keyswitch-free MUX composition (gates.rs:157-183):
    two hybrid bootstraps OR-combined into one full bootstrap."""
    eighth = np.uint64(f64_to_torus_eighth)
    t1 = (a + b).astype(np.uint32)
    t1[-1] = _u32(np.uint64(t1[-1]) + np.uint64(1 << 32) - eighth)  # and(a,b) bias -1/8
    u1 = bootstrap_without_key_switch(t1, testvec, bsk, params, centered, neg)
    t2 = (neg_exact(a) + c).astype(np.uint32)
    t2[-1] = _u32(np.uint64(t2[-1]) + np.uint64(1 << 32) - eighth)  # and(not a, c); reference not() is exact
    u2 = bootstrap_without_key_switch(t2, testvec, bsk, params, centered, neg)
    t3 = (u1 + u2).astype(np.uint32)
    t3[-1] = _u32(np.uint64(t3[-1]) + eighth)  # or bias +1/8
    return gate_bootstrap(t3, testvec, bsk, ksk_rows, params, centered, neg)


def ksk_rows_from_limbs(ksk_limbs: np.ndarray, n0: int) -> np.ndarray:
    """Rebuild uint32 KSK rows [rows, n0+1] from the int8 limb matrix the
    CloudKey stores — planar-padded layout [rows, 4*lane_pad(n0+1)], column
    q*P + c (key.gen_key_switching_key / tlwe.lwe_encrypt_rows_limbs)."""
    rows = ksk_limbs.shape[0]
    p = ksk_limbs.shape[1] // 4
    l = ksk_limbs.astype(np.int64).reshape(rows, 4, p)[:, :, : n0 + 1]
    acc = np.zeros((rows, n0 + 1), dtype=np.uint64)
    for q in range(4):
        acc += (l[:, q, :] << (8 * q)).astype(np.uint64)
    return acc.astype(np.uint32)
