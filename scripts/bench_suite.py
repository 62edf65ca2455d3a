"""Per-op benchmark suite — criterion parity with the reference's
benches/gate_benchmarks.rs:12-126 (gate_nand, six-gate group, mux,
blind_rotate, transform ops) plus this framework's own surfaces (keygen,
keyswitch, LUT bootstrap, radix add, proxy hop, batch sweep).

Writes ONE JSON object to BENCH_SUITE.json (and stdout) with named
sub-metrics so per-op regressions are visible across rounds — the headline
bench.py single line stays unchanged.

Timing per NOTES-PERF.md: chained iterations threading real data through
the carry, scalar host read as the barrier, best-of-2.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from rs_tfhe_tpu import ALL_SECURITY_SETS, proxy_reenc  # noqa: E402
from rs_tfhe_tpu import bootstrap as BS  # noqa: E402
from rs_tfhe_tpu import gates  # noqa: E402
from rs_tfhe_tpu.key import CloudKey, SecretKey  # noqa: E402
from rs_tfhe_tpu.models.arithmetic import add_radix, encrypt_radix  # noqa: E402
from rs_tfhe_tpu.ops.blind_rotate import blind_rotate  # noqa: E402
from rs_tfhe_tpu.ops.keyswitch import identity_key_switch  # noqa: E402
from rs_tfhe_tpu.tlwe import lwe_encrypt_bool, lwe_encrypt_message  # noqa: E402

RESULTS: list[dict] = []


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def record(name, value, unit):
    RESULTS.append({"name": name, "value": round(value, 3), "unit": unit})
    log(f"  {name}: {value:.3f} {unit}")


def timeit(fn, *args, iters=3, chain=None):
    """Median wall time of `fn(*args)` chained `iters` times inside one jit.

    chain(out, args) -> args threads the output into the next call so XLA
    cannot elide iterations; defaults to reusing args (fine when fn's cost
    dominates and its output feeds the barrier read).
    """

    @jax.jit
    def chained(*a):
        out = None
        cur = a
        for _ in range(iters):
            out = fn(*cur)
            if chain is not None:
                cur = chain(out, cur)
        return out

    out = chained(*args)
    _ = np.asarray(jax.device_get(jnp.ravel(out if isinstance(out, jax.Array) else out[0])[0]))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = chained(*args)
        _ = np.asarray(jax.device_get(jnp.ravel(out if isinstance(out, jax.Array) else out[0])[0]))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def timeit_slope(fn, *args, short=5, long=25, chain=None, repeats=4):
    """Per-iteration time from the slope between two in-jit chain lengths.

    Cancels the per-dispatch tunnel round-trip (~40 ms — dominant at
    batch-1 latency scales); min over repeats kills tunnel hiccups
    (single-shot timings occasionally read 10-100x high)."""

    def build(n):
        @jax.jit
        def chained(*a):
            out = None
            cur = a
            for _ in range(n):
                out = fn(*cur)
                if chain is not None:
                    cur = chain(out, cur)
            return out

        return chained

    def min_time(chained):
        out = chained(*args)
        _ = np.asarray(jax.device_get(jnp.ravel(
            out if isinstance(out, jax.Array) else out[0])[0]))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = chained(*args)
            _ = np.asarray(jax.device_get(jnp.ravel(
                out if isinstance(out, jax.Array) else out[0])[0]))
            best = min(best, time.perf_counter() - t0)
        return best

    return (min_time(build(long)) - min_time(build(short))) / (long - short)


def xor_into_body(out, cur):
    """Fold the WHOLE output into the next input (sum touches every
    element, so no iteration can be dead-code-eliminated)."""
    s = jnp.sum(jnp.ravel(out).astype(jnp.uint32)) & jnp.uint32(1)
    a = cur[0].at[..., -1].add(s + jnp.uint32(1))
    return (a, *cur[1:])


def main():
    pname = os.environ.get("RS_TFHE_BENCH_PARAMS", "SECURITY_128_BIT_FAST")
    params = ALL_SECURITY_SETS[pname]
    dev = jax.devices()[0]
    log(f"device={dev} params={pname}")

    rng = np.random.default_rng(0)

    # --- keygen (warm: second call, first pays compile) ---
    sk = SecretKey.generate(jax.random.key(42), params)
    t0 = time.perf_counter()
    ck = CloudKey.generate(jax.random.key(7), sk)
    _ = np.asarray(jax.device_get(ck.bsk.ravel()[0]))
    log(f"keygen cold: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    ck = CloudKey.generate(jax.random.key(8), sk)
    _ = np.asarray(jax.device_get(ck.bsk.ravel()[0]))
    record("keygen_warm", (time.perf_counter() - t0) * 1e3, "ms")

    def enc_pair(batch, seed=1):
        bits = rng.integers(0, 2, batch).astype(bool)
        a = lwe_encrypt_bool(jax.random.key(seed), sk.lv0, jnp.asarray(bits),
                             params.tlwe_lv0.alpha)
        b = lwe_encrypt_bool(jax.random.key(seed + 1), sk.lv0,
                             jnp.asarray(~bits), params.tlwe_lv0.alpha)
        return a, b

    # --- single-gate latency (batch 1) ---
    a1, b1 = enc_pair(1)
    dt = timeit_slope(lambda a, b: gates.nand(a, b, ck), a1, b1,
                      chain=xor_into_body)
    record("gate_nand_b1_latency", dt * 1e3, "ms")

    # --- multi-bit (pair-grouped) latency: half-length CMUX chain via a
    # multibit=True CloudKey (gates auto-route batches <= 2 through it) ---
    from rs_tfhe_tpu.ops.pallas_blind_rotate import small_param_ok

    if params.n0 % 2 == 0 and small_param_ok(params):
        ck_mb = CloudKey.generate(jax.random.key(7), sk, multibit=True)
        dt = timeit_slope(lambda a, b: gates.nand(a, b, ck_mb), a1, b1,
                          chain=xor_into_body)
        record("gate_nand_b1_latency_mb", dt * 1e3, "ms")
        del ck_mb

    # --- gate throughput sweep (b10240 = BASELINE.json's "batch-10k
    # bootstrap wall-clock" config) ---
    for batch in (128, 2048, 4096, 10240):
        a, b = enc_pair(batch)
        dt = timeit(lambda x, y: gates.nand(x, y, ck), a, b,
                    iters=3 if batch >= 2048 else 5, chain=xor_into_body)
        record(f"gate_nand_b{batch}", batch / dt, "gates/s")
        if batch == 10240:
            record("gate_batch10k_wall", dt * 1e3, "ms")

    # --- six-gate group (reference benches the 6-gate set together) ---
    a, b = enc_pair(2048)

    def six(x, y):
        out = gates.nand(x, y, ck)
        for g in (gates.and_, gates.or_, gates.xor, gates.xnor, gates.nor):
            out = g(out, y, ck)
        return out

    dt = timeit(six, a, b, iters=1)
    record("six_gate_group_b2048", 6 * 2048 / dt, "gates/s")

    # --- mux ---
    am, bm = enc_pair(1024)
    cm, _ = enc_pair(1024, seed=5)
    dt = timeit(lambda x, y, z: gates.mux(x, y, z, ck), am, bm, cm, iters=2,
                chain=xor_into_body)
    record("mux_b1024", 1024 / dt, "mux/s")

    # --- blind rotate only ---
    a, _ = enc_pair(2048)
    lin = gates._nand_lin(a, gates._lin(a))  # any linear form
    dt = timeit(
        lambda x: blind_rotate(x, ck.testvec, ck.bsk, params,
                               bsk_packed=ck.bsk_packed),
        lin, iters=3, chain=xor_into_body)
    record("blind_rotate_b2048", 2048 / dt, "rot/s")

    # --- key switch only ---
    from rs_tfhe_tpu.ops.extract import sample_extract

    acc = blind_rotate(lin, ck.testvec, ck.bsk, params,
                       bsk_packed=ck.bsk_packed)
    lv1 = sample_extract(acc)
    dt = timeit(lambda x: identity_key_switch(x, ck.ksk_limbs, params),
                lv1, iters=5, chain=xor_into_body)
    record("keyswitch_b2048", 2048 / dt, "ops/s")

    # --- LUT (programmable) bootstrap ---
    lb = BS.LutBootstrap()
    msgs = jnp.asarray(rng.integers(0, 8, 2048), jnp.uint32)
    ct = lwe_encrypt_message(jax.random.key(3), sk.lv0, msgs, 8,
                             params.tlwe_lv0.alpha)
    dt = timeit(lambda x: lb.bootstrap_func(x, lambda v: (v * 3) % 8, 8, ck),
                ct, iters=3, chain=xor_into_body)
    record("lut_bootstrap_b2048", 2048 / dt, "PBS/s")

    # --- radix 8-bit add (batch of 64 pairs) ---
    xs = rng.integers(0, 256, 64)
    ys = rng.integers(0, 256, 64)
    nd = 3  # ceil(8 bits / 3-bit digits)
    ra = encrypt_radix(jax.random.key(4), sk.lv0, xs, nd, params)
    rb = encrypt_radix(jax.random.key(5), sk.lv0, ys, nd, params)
    dt = timeit(lambda x, y: add_radix(x, y, ck), ra, rb, iters=1)
    record("radix_add8_b64", dt * 1e3 / 64, "ms/add")

    # --- transform-level ops (criterion parity: fft fwd/inv/poly_mul) ---
    # our "transform" is the circulant expansion + exact limb contraction;
    # bench one full external-product step (the poly_mul analogue) and the
    # Nussbaumer transform step at the same shape
    from rs_tfhe_tpu.ops.decompose import gadget_decompose
    from rs_tfhe_tpu.ops.nussbaumer import (
        check_bounds,
        external_product_step,
        prepare_bsk_step,
    )
    from rs_tfhe_tpu.ops.poly import build_step_matrix, polymul_small_by_torus_multi

    g = params.trgsw_lv1
    step_polys = jnp.asarray(
        rng.integers(0, 1 << 32, (2 * g.l, 2, params.n1), dtype=np.uint32)
    )
    trlwe = jnp.asarray(
        rng.integers(0, 1 << 32, (2048, 2, params.n1), dtype=np.uint32)
    )

    def ext_step(x):
        d = gadget_decompose(x, params)
        mat = build_step_matrix(step_polys)
        return polymul_small_by_torus_multi(d, mat, params.digit_limbs, 2)

    dt = timeit(ext_step, trlwe, iters=3,
                chain=lambda out, cur: (cur[0] + (jnp.sum(out) & jnp.uint32(1)),))
    record("external_product_step_b2048", 2048 / dt, "ops/s")

    if check_bounds(params):
        def nuss_step(x):
            d = gadget_decompose(x, params)
            return external_product_step(d, prepare_bsk_step(step_polys, params), params)

        dt = timeit(nuss_step, trlwe, iters=3,
                    chain=lambda out, cur: (cur[0] + (jnp.sum(out) & jnp.uint32(1)),))
        record("nussbaumer_step_b2048", 2048 / dt, "ops/s")

    # --- circuit-level machinery on hardware (VERDICT r4 item 3): the
    # netlist-scheduled 32-bit ripple-carry adder, its gate-at-a-time
    # counterpart (the reference's dispatch model, add_two_numbers.rs:98-113),
    # the Kogge-Stone adder, and an encrypted bit-circuit sort ---
    from rs_tfhe_tpu.bit_utils import decrypt_uint, encrypt_uint
    from rs_tfhe_tpu.models import netlist, sort_bits

    ckt, a_w, b_w, sums = netlist.ripple_carry_adder(32)
    the_plan = netlist.plan(ckt)
    n_boot = sum(1 for g in ckt.gates if g.op not in ("not", "copy"))
    xv, yv = 0xDEADBEEF, 0x12345678
    ea = encrypt_uint(jax.random.key(70), sk.lv0, xv, 32, params.tlwe_lv0.alpha)
    eb = encrypt_uint(jax.random.key(71), sk.lv0, yv, 32, params.tlwe_lv0.alpha)
    inputs = jnp.concatenate([ea, eb], axis=0)
    ck_mb = CloudKey.generate(jax.random.key(7), sk, multibit=True)

    def run_plan(pl_, key):
        wires = netlist.evaluate(ckt, inputs, key, pl_)
        _ = np.asarray(jax.device_get(wires.ravel()[0]))
        return wires

    wires = run_plan(the_plan, ck_mb)  # warm + correctness
    got = decrypt_uint(wires[jnp.asarray(sums)], sk.lv0)
    assert int(got) == (xv + yv) % (1 << 32), got
    for label, key in (("circuit_rc_adder32_wall", ck),
                       ("circuit_rc_adder32_wall_mb", ck_mb)):
        best = float("inf")
        run_plan(the_plan, key)  # warm this key's executables
        for _ in range(2):
            t0 = time.perf_counter()
            run_plan(the_plan, key)
            best = min(best, time.perf_counter() - t0)
        record(label, best * 1e3, "ms")
        if key is ck_mb:
            record("circuit_rc_adder32_rate_mb", n_boot / best, "gates/s")

    # gate-at-a-time: singleton groups in the same order — the reference's
    # sequential dispatch model; the plan-group batching must beat it
    order = the_plan.order
    op_names = [ckt.gates[int(g)].op for g in order]
    lvls = [int(the_plan.levels[int(g)]) for g in order]
    singles = netlist.Plan(
        levels=the_plan.levels, order=order,
        groups=[(i, i + 1, op_names[i], lvls[i]) for i in range(len(order))],
        n_levels=the_plan.n_levels,
    )
    run_plan(singles, ck_mb)  # warm
    t0 = time.perf_counter()
    run_plan(singles, ck_mb)
    record("circuit_rc_adder32_gate_at_a_time_wall",
           (time.perf_counter() - t0) * 1e3, "ms")

    # whole-plan jit (netlist.compile_circuit): every group in ONE dispatch
    run_jit = netlist.compile_circuit(ckt, the_plan)
    wires = run_jit(inputs, ck_mb)  # warm (compiles the full plan)
    got = decrypt_uint(wires[jnp.asarray(sums)], sk.lv0)
    assert int(got) == (xv + yv) % (1 << 32), got
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        wires = run_jit(inputs, ck_mb)
        _ = np.asarray(jax.device_get(wires.ravel()[0]))
        best = min(best, time.perf_counter() - t0)
    record("circuit_rc_adder32_wall_jit_mb", best * 1e3, "ms")
    record("circuit_rc_adder32_rate_jit_mb", n_boot / best, "gates/s")

    # Kogge-Stone 32-bit add (the batched-parallel adder: ~2+log2 W levels)
    from rs_tfhe_tpu.models.circuits import add_kogge_stone

    _ = np.asarray(jax.device_get(add_kogge_stone(ea, eb, ck).ravel()[0]))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _ = np.asarray(jax.device_get(add_kogge_stone(ea, eb, ck).ravel()[0]))
        best = min(best, time.perf_counter() - t0)
    record("kogge_stone_add32_wall", best * 1e3, "ms")

    # encrypted sort: K=8 8-bit integers, bitonic network of batched gate
    # comparators + swap-MUXes (boolean margins — FAST-safe)
    vals = rng.integers(0, 256, 8)
    scts = jnp.stack([
        encrypt_uint(jax.random.key(80 + i), sk.lv0, int(v), 8,
                     params.tlwe_lv0.alpha)
        for i, v in enumerate(vals)
    ])
    sorted_cts = sort_bits(scts, ck)  # warm + correctness
    got = [int(decrypt_uint(sorted_cts[i], sk.lv0)) for i in range(8)]
    assert got == sorted(vals.tolist()), got
    t0 = time.perf_counter()
    out = sort_bits(scts, ck)
    _ = np.asarray(jax.device_get(out.ravel()[0]))
    record("sort8x8bit_gates_wall", (time.perf_counter() - t0) * 1e3, "ms")
    del ck_mb

    # --- proxy re-encryption hop ---
    sk_b = SecretKey.generate(jax.random.key(9), params)
    rk = proxy_reenc.new_symmetric(jax.random.key(10), sk.lv0, sk_b.lv0, params)
    a, _ = enc_pair(4096)
    dt = timeit(lambda x: proxy_reenc.reencrypt(x, rk), a, iters=5,
                chain=xor_into_body)
    record("proxy_hop_b4096", 4096 / dt, "hops/s")

    # --- other parameter families (skippable: RS_TFHE_BENCH_EXTRA=0) ---
    if os.environ.get("RS_TFHE_BENCH_EXTRA", "1") == "1":
        pr = ALL_SECURITY_SETS["SECURITY_128_BIT_RADIX"]
        skr = SecretKey.generate(jax.random.key(30), pr)
        ckr = CloudKey.generate(jax.random.key(31), skr)
        xs = rng.integers(0, 256, 64)
        ys = rng.integers(0, 256, 64)
        ra = encrypt_radix(jax.random.key(32), skr.lv0, xs, 2, pr, base_bits=4)
        rb = encrypt_radix(jax.random.key(33), skr.lv0, ys, 2, pr, base_bits=4)
        # keys must be jit ARGUMENTS here: closure-captured CloudKeys become
        # HLO constants and the N=2048 KSK (~320 MB) exceeds the remote-
        # compile request cap (HTTP 413)
        dt = timeit(lambda x, y, k: add_radix(x, y, k, base_bits=4), ra, rb,
                    ckr, iters=1)
        record("radix_nibble_add8_b64_RADIX", dt * 1e3 / 64, "ms/add")

        # encrypted radix sort, K=8 6-bit values (2 base-8 digits) at the
        # certified base-8 set (FAST cannot host the modulus-16 combine
        # margins — 2.2 sigma; RADIX certifies them at 7.3): PBS trichotomy
        # comparators + select swaps (VERDICT r4 item 3)
        from rs_tfhe_tpu.models import decrypt_radix as _dec_radix
        from rs_tfhe_tpu.models import sort_radix

        svals = rng.integers(0, 64, 8)
        rcts = jnp.stack([
            encrypt_radix(jax.random.key(90 + i), skr.lv0,
                          np.array(int(v)), 2, pr, base_bits=3)
            for i, v in enumerate(svals)
        ])
        rsorted = sort_radix(rcts, ckr, base_bits=3)  # warm + correctness
        rgot = [int(_dec_radix(rsorted[i], skr.lv0, base_bits=3))
                for i in range(8)]
        assert rgot == sorted(svals.tolist()), rgot
        t0 = time.perf_counter()
        out = sort_radix(rcts, ckr, base_bits=3)
        _ = np.asarray(jax.device_get(out.ravel()[0]))
        record("sort8_radix_wall_RADIX", (time.perf_counter() - t0) * 1e3,
               "ms")

        pu = ALL_SECURITY_SETS["SECURITY_UINT4"]
        sku = SecretKey.generate(jax.random.key(40), pu)
        cku = CloudKey.generate(jax.random.key(41), sku)
        m16 = jnp.asarray(rng.integers(0, 16, 2048), jnp.uint32)
        ctu = lwe_encrypt_message(jax.random.key(42), sku.lv0, m16, 16,
                                  pu.tlwe_lv0.alpha)
        dt = timeit(
            lambda x, k: BS.LutBootstrap().bootstrap_func(
                x, lambda v: (v * 3 + 1) % 16, 16, k
            ),
            ctu, cku, iters=2, chain=xor_into_body)
        record("uint4_pbs_b2048", 2048 / dt, "PBS/s")

        # the certified base-16 set (N=4096): nibble add rate
        pb = ALL_SECURITY_SETS["SECURITY_128_BIT_NIBBLE"]
        skb = SecretKey.generate(jax.random.key(50), pb)
        ckb = CloudKey.generate(jax.random.key(51), skb)
        xs = rng.integers(0, 256, 64)
        ys = rng.integers(0, 256, 64)
        na = encrypt_radix(jax.random.key(52), skb.lv0, xs, 2, pb, base_bits=4)
        nb = encrypt_radix(jax.random.key(53), skb.lv0, ys, 2, pb, base_bits=4)
        dt = timeit(lambda x, y, k: add_radix(x, y, k, base_bits=4), na, nb,
                    ckb, iters=1)
        record("nibble_add8_3pbs_b64_NIBBLE", dt * 1e3 / 64, "ms/add")

        # 16-bit x 16-bit ciphertext multiply (beyond the reference, which
        # has no ct x ct multiply at all; the carry-save normalization
        # stage lifts the old 8-bit operand cap — models/arithmetic.py)
        from rs_tfhe_tpu.models.arithmetic import decrypt_radix, mul_radix

        xs16 = rng.integers(0, 1 << 16, 16)
        ys16 = rng.integers(0, 1 << 16, 16)
        wa = encrypt_radix(jax.random.key(54), skb.lv0, xs16, 8, pb, base_bits=2)
        wb = encrypt_radix(jax.random.key(55), skb.lv0, ys16, 8, pb, base_bits=2)
        prod = mul_radix(wa, wb, ckb, base_bits=2)
        got = np.asarray(decrypt_radix(prod, skb.lv0, base_bits=2))
        assert (got == (xs16 * ys16) & 0xFFFF).all() or (
            got == xs16 * ys16).all(), "mul16 correctness"
        dt = timeit(lambda x, y, k: mul_radix(x, y, k, base_bits=2), wa, wb,
                    ckb, iters=1)
        record("mul16x16_b16_NIBBLE", dt * 1e3 / 16, "ms/mul")
        # multi-value stage-2 factoring (one rotation for the (lo, hi)
        # pair — VERDICT r4 item 4); decode-identical, margin 6.27 sigma
        prod = mul_radix(wa, wb, ckb, base_bits=2, multi_value=True)
        got = np.asarray(decrypt_radix(prod, skb.lv0, base_bits=2))
        assert (got == xs16 * ys16).all(), "mul16 mv correctness"
        dt = timeit(lambda x, y, k: mul_radix(x, y, k, base_bits=2,
                                              multi_value=True),
                    wa, wb, ckb, iters=1)
        record("mul16x16_b16_NIBBLE_mv", dt * 1e3 / 16, "ms/mul")

        # 8-bit x 8-bit (no normalization rounds: 2D^2+6D = 56 PBS std)
        xs8b = rng.integers(0, 256, 16)
        ys8b = rng.integers(0, 256, 16)
        va = encrypt_radix(jax.random.key(56), skb.lv0, xs8b, 4, pb, base_bits=2)
        vb = encrypt_radix(jax.random.key(57), skb.lv0, ys8b, 4, pb, base_bits=2)
        for mv, tag in ((False, ""), (True, "_mv")):
            prod = mul_radix(va, vb, ckb, base_bits=2, multi_value=mv)
            got = np.asarray(decrypt_radix(prod, skb.lv0, base_bits=2))
            assert (got == xs8b * ys8b).all(), f"mul8 mv={mv} correctness"
            dt = timeit(lambda x, y, k: mul_radix(x, y, k, base_bits=2,
                                                  multi_value=mv),
                        va, vb, ckb, iters=1)
            record(f"mul8x8_b16_NIBBLE{tag}", dt * 1e3 / 16, "ms/mul")

        # apples-to-apples at the literal SECURITY_128_BIT the baseline
        # names (L=3, Bg=2^6, reference params.rs:379-404) — the FAST
        # hardness argument stands beside this, not instead of it
        ps = ALL_SECURITY_SETS["SECURITY_128_BIT"]
        sks = SecretKey.generate(jax.random.key(60), ps)
        cks = CloudKey.generate(jax.random.key(61), sks)
        bits = rng.integers(0, 2, 4096).astype(bool)
        sa = lwe_encrypt_bool(jax.random.key(62), sks.lv0, jnp.asarray(bits),
                              ps.tlwe_lv0.alpha)
        sb = lwe_encrypt_bool(jax.random.key(63), sks.lv0,
                              jnp.asarray(~bits), ps.tlwe_lv0.alpha)
        dt = timeit(lambda x, y: gates.nand(x, y, cks), sa, sb, iters=3,
                    chain=xor_into_body)
        record("gate_nand_b4096_STRICT", 4096 / dt, "gates/s")
        dt = timeit_slope(lambda x, y: gates.nand(x, y, cks),
                          sa[:1], sb[:1], chain=xor_into_body)
        record("gate_nand_b1_latency_STRICT", dt * 1e3, "ms")
        cks_mb = CloudKey.generate(jax.random.key(61), sks, multibit=True)
        dt = timeit_slope(lambda x, y: gates.nand(x, y, cks_mb),
                          sa[:1], sb[:1], chain=xor_into_body)
        record("gate_nand_b1_latency_STRICT_mb", dt * 1e3, "ms")
        del cks_mb

        # the other two reference boolean sets, at their literal constants
        # (params.rs:91-146) — runtime-selectable here, where the reference
        # pins the 128-bit set at compile time and cannot execute these
        from rs_tfhe_tpu.tlwe import lwe_decrypt_bool

        for nm, kk, tag in (("SECURITY_80_BIT", 70, "80BIT"),
                            ("SECURITY_110_BIT", 80, "110BIT")):
            pz = ALL_SECURITY_SETS[nm]
            skz = SecretKey.generate(jax.random.key(kk), pz)
            ckz = CloudKey.generate(jax.random.key(kk + 1), skz)
            bits = rng.integers(0, 2, 4096).astype(bool)
            za = lwe_encrypt_bool(jax.random.key(kk + 2), skz.lv0,
                                  jnp.asarray(bits), pz.tlwe_lv0.alpha)
            zb = lwe_encrypt_bool(jax.random.key(kk + 3), skz.lv0,
                                  jnp.asarray(~bits), pz.tlwe_lv0.alpha)
            outz = gates.nand(za, zb, ckz)  # b & ~b == 0 -> nand all True
            assert bool(jnp.all(lwe_decrypt_bool(outz, skz.lv0))), nm
            dt = timeit(lambda x, y: gates.nand(x, y, ckz), za, zb, iters=3,
                        chain=xor_into_body)
            record(f"gate_nand_b4096_{tag}", 4096 / dt, "gates/s")

    out = {
        "device": str(dev),
        "params": pname,
        "metrics": RESULTS,
    }
    # attach the measured B=1..128 latency-vs-batch table when present
    # (scripts/bench_latency_sweep.py — VERDICT r4 item 2)
    sweep_path = os.path.join(os.path.dirname(__file__), "..",
                              "LATENCY_SWEEP_r05.json")
    if os.path.exists(sweep_path):
        with open(sweep_path) as f:
            out["latency_vs_batch"] = json.load(f)["rows"]
    with open(os.path.join(os.path.dirname(__file__), "..", "BENCH_SUITE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
