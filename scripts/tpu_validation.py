"""Full-stack validation on real TPU hardware at SECURITY_128_BIT.

Runs every major capability end-to-end at production parameters and asserts
100% correctness: all 12 gate truth tables, MUX, programmable bootstrapping,
radix arithmetic (including the RADIX-set nibble add and ciphertext
multiply), a 16-bit Kogge-Stone addition, proxy re-encryption, and
key-serialization round trips. Complements the CPU test suite (TEST_TINY)
and bench.py (throughput only).

    python scripts/tpu_validation.py          # ~4 min incl. compiles
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

# Every stage is bit-exact integer math, so --cpu runs the identical
# pipeline on the CPU backend; golden vectors captured there MUST verify
# on TPU (and vice versa) — a cross-backend drift check for free.
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    # NO persistent cache on CPU: this host's XLA:CPU AOT loader logs
    # "+prefer-no-gather is not supported ... could lead to SIGILL" and has
    # segfaulted deserializing cached executables (tests/conftest.py).
    jax.config.update("jax_compilation_cache_dir", None)
else:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import rs_tfhe_tpu as tfhe
from rs_tfhe_tpu import gates, models, proxy_reenc as pre, tlwe
from rs_tfhe_tpu.bit_utils import decrypt_uint, encrypt_uint
from rs_tfhe_tpu.bootstrap import LutBootstrap
from rs_tfhe_tpu.utils.serialization import load_cloud_key, save_cloud_key

PASS = 0

#: Production-set golden vectors (VERDICT r2 item 5, mirroring the
#: reference's FFT vector discipline, fft/mod.rs:136-159): every run
#: compares the fixed-seed ciphertext outputs below against
#: tests/vectors/golden_production.npz; `--write-golden` (re)captures them.
#: Everything here is deterministic given the jax.random seeds, so any
#: numeric drift at SECURITY_128_BIT / UINT4 / RADIX / NIBBLE scale fails
#: loudly with a named stage.
GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "vectors", "golden_production.npz",
)
ARTIFACTS: dict[str, np.ndarray] = {}


def record(name: str, arr) -> None:
    ARTIFACTS[name] = np.asarray(jax.device_get(arr))


def golden_finalize() -> None:
    if "--write-golden" in sys.argv:
        np.savez_compressed(GOLDEN, **ARTIFACTS)
        print(f"wrote {GOLDEN}: {sorted(ARTIFACTS)}")
        return
    if not os.path.exists(GOLDEN):
        print(f"note: {GOLDEN} absent — run with --write-golden to pin")
        return
    stored = np.load(GOLDEN)
    # --small runs only the N <= 1024 stages (CPU-feasible): compare just
    # the stages that ran; the full run still demands every stored vector
    names = (
        [n for n in stored.files if n in ARTIFACTS]
        if "--small" in sys.argv
        else stored.files
    )
    for name in names:
        check(f"golden[{name}]",
              name in ARTIFACTS
              and np.array_equal(stored[name], ARTIFACTS[name]))


def check(name: str, ok: bool) -> None:
    global PASS
    status = "PASS" if ok else "FAIL"
    print(f"  [{status}] {name}", flush=True)
    if not ok:
        raise SystemExit(f"validation failed at: {name}")
    PASS += 1
    # XLA:CPU on this host segfaults LOADING a fresh executable once enough
    # executables accumulate in one process (tests/conftest.py clears
    # between modules for the same reason; both --small runs died at the
    # netlist stage — ~30 loaded executables — before this). Dropping
    # compiled programs after every check keeps the loader safe; TEST-sized
    # recompiles cost seconds. TPU runs are unaffected (no clearing).
    if jax.devices()[0].platform != "tpu":
        jax.clear_caches()


def check_mosaic_tripwire() -> None:
    """CI tripwire (VERDICT r4 item 8): the s8-only MAC floor rests on
    Mosaic rejecting s16xs16 dots (NOTES-PERF.md). The day a JAX/Mosaic
    release unlocks them, this check FAILS LOUDLY — that failure means a
    ~2.6x MAC-cut lever just became available and the kernels should be
    revisited, not that anything is broken."""
    if jax.devices()[0].platform != "tpu":
        return
    import probe_mosaic

    s16_ok = True
    try:
        jax.block_until_ready(probe_mosaic.probe_dot(jnp.int16, 128, 1024, 256))
    except Exception:
        s16_ok = False
    check(
        "mosaic still rejects s16 dots (a FAILURE here = MAC-cut lever "
        "unlocked; rerun scripts/probe_mosaic.py and see NOTES-PERF.md)",
        not s16_ok,
    )


def main() -> None:
    p = tfhe.SECURITY_128_BIT
    print(f"device: {jax.devices()[0]}  params: {p.description}")
    check_mosaic_tripwire()
    t0 = time.perf_counter()
    sk = tfhe.SecretKey.generate(jax.random.key(42), p)
    ck = tfhe.CloudKey.generate(jax.random.key(7), sk)
    alpha = p.tlwe_lv0.alpha
    print(f"keygen: {time.perf_counter() - t0:.1f}s")

    # -- all gate truth tables over the 4 input combinations, batch of 64 ----
    rng = np.random.default_rng(0)
    a_bits = rng.integers(0, 2, 64).astype(bool)
    b_bits = rng.integers(0, 2, 64).astype(bool)
    ka, kb, kc = jax.random.split(jax.random.key(3), 3)
    a = tlwe.lwe_encrypt_bool(ka, sk.lv0, jnp.asarray(a_bits), alpha)
    b = tlwe.lwe_encrypt_bool(kb, sk.lv0, jnp.asarray(b_bits), alpha)
    truth = {
        "nand": lambda x, y: ~(x & y), "and": lambda x, y: x & y,
        "or": lambda x, y: x | y, "nor": lambda x, y: ~(x | y),
        "xor": lambda x, y: x ^ y, "xnor": lambda x, y: ~(x ^ y),
        "and_ny": lambda x, y: ~x & y, "and_yn": lambda x, y: x & ~y,
        "or_ny": lambda x, y: ~x | y, "or_yn": lambda x, y: x | ~y,
    }
    for name, fn in truth.items():
        out = gates.batch_gate(name, a, b, ck)
        if name == "nand":
            record("nand_128", out)
        dec = np.asarray(jax.device_get(tlwe.lwe_decrypt_bool(out, sk.lv0)))
        check(f"gate {name}", (dec == fn(a_bits, b_bits)).all())

    # -- multi-bit (pair-grouped) latency path: B<=2 auto-routes through
    # the half-length chain when the key carries mb material ---------------
    ck_mb = tfhe.CloudKey.generate(jax.random.key(7), sk, multibit=True)
    out_mb = gates.batch_gate("nand", a[:2], b[:2], ck_mb)
    record("nand_mb_128", out_mb)
    dec = np.asarray(jax.device_get(tlwe.lwe_decrypt_bool(out_mb, sk.lv0)))
    check("gate nand (multibit key, B=2)",
          (dec == ~(a_bits[:2] & b_bits[:2])).all())

    # mb bootstrap output noise vs the estimate(mb_group=2) model — the
    # round-5 direct measurement (measure_mb_noise.py: ratio ~0.81 at this
    # set over 4096 samples); the model must stay conservative but honest.
    # TPU-only: 256 production-set bootstraps are seconds on the chip,
    # minutes on the single CPU core.
    if jax.devices()[0].platform == "tpu":
        import measure_mb_noise

        row = measure_mb_noise.measure_set(
            "SECURITY_128_BIT", 128, True, sk, ck_mb)
        check("mb phase noise within model (0.5 <= measured/model <= 1.15)",
              0.5 <= row["ratio"] <= 1.15 and row["gate_errors"] == 0)
    del ck_mb

    c_bits = rng.integers(0, 2, 64).astype(bool)
    c = tlwe.lwe_encrypt_bool(kc, sk.lv0, jnp.asarray(c_bits), alpha)
    out = gates.mux(a, b, c, ck)
    record("mux_128", out)
    dec = np.asarray(jax.device_get(tlwe.lwe_decrypt_bool(out, sk.lv0)))
    check("mux", (dec == np.where(a_bits, b_bits, c_bits)).all())
    dec = np.asarray(jax.device_get(tlwe.lwe_decrypt_bool(gates.not_(a), sk.lv0)))
    check("not", (dec == ~a_bits).all())

    # -- programmable bootstrap: square mod 8 over all messages -------------
    m = 8
    msgs = jnp.asarray(np.arange(m))
    ct = tlwe.lwe_encrypt_message(jax.random.key(5), sk.lv0, msgs, m, alpha)
    sq = LutBootstrap().bootstrap_func(ct, lambda x: (x * x) % m, m, ck)
    record("pbs_square_128", sq)
    check("lut square mod 8",
          list(tlwe.lwe_decrypt_message(sq, sk.lv0, m)) == [(x * x) % m for x in range(m)])

    # -- radix arithmetic: 8-bit add in 3 PBS --------------------------------
    ra = models.encrypt_radix(jax.random.key(6), sk.lv0, 137, 3, p, 3)
    rb = models.encrypt_radix(jax.random.key(7), sk.lv0, 205, 3, p, 3)
    rsum = models.add_radix(ra, rb, ck, 3)
    record("radix_add_128", rsum)
    check("radix 9-bit add (5 PBS)",
          int(models.decrypt_radix(rsum, sk.lv0, 3)) == (137 + 205) % 512)

    # -- 16-bit Kogge-Stone addition -----------------------------------------
    x, y = 40590, 27063
    ea = encrypt_uint(jax.random.key(8), sk.lv0, x, 16, alpha)
    eb = encrypt_uint(jax.random.key(9), sk.lv0, y, 16, alpha)
    es = models.add_kogge_stone(ea, eb, ck)
    record("kogge_stone_128", es)
    check("kogge-stone 16-bit add", decrypt_uint(es, sk.lv0) == (x + y) % 65536)

    # -- netlist scheduler at production params (VERDICT r4 item 3): the
    # level-grouped plan (C++ planner when built) drives the same 16-bit
    # add through batched per-group dispatches ---------------------------
    from rs_tfhe_tpu.models import netlist

    ckt, _, _, sums = netlist.ripple_carry_adder(16)
    the_plan = netlist.plan(ckt)
    wires = netlist.evaluate(ckt, jnp.concatenate([ea, eb], axis=0), ck,
                             the_plan)
    got = decrypt_uint(wires[jnp.asarray(sums)], sk.lv0)
    check("netlist-scheduled 16-bit ripple-carry add "
          f"({len(the_plan.groups)} plan groups, {len(ckt.gates)} gates)",
          int(got) == (x + y) % 65536)

    # -- proxy re-encryption (asymmetric) ------------------------------------
    bob = tfhe.SecretKey.generate(jax.random.key(10), p)
    bob_pk = pre.PublicKeyLv0.generate(jax.random.key(11), bob.lv0, p)
    rk = pre.new_asymmetric(jax.random.key(12), sk.lv0, bob_pk, p)
    re_ct = pre.reencrypt(a, rk)
    dec = np.asarray(jax.device_get(tlwe.lwe_decrypt_bool(re_ct, bob.lv0)))
    check("asymmetric proxy re-encryption", (dec == a_bits).all())

    # -- key serialization round trip ----------------------------------------
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ck.npz")
        save_cloud_key(path, ck)
        ck2 = load_cloud_key(path)
    out = gates.nand(a, b, ck2)
    dec = np.asarray(jax.device_get(tlwe.lwe_decrypt_bool(out, sk.lv0)))
    check("reloaded cloud key", (dec == ~(a_bits & b_bits)).all())

    # -- Uint4 parameter set: multi-limb digit path at full scale ------------
    p4 = tfhe.SECURITY_UINT4
    sk4 = tfhe.SecretKey.generate(jax.random.key(20), p4)
    ck4 = tfhe.CloudKey.generate(jax.random.key(21), sk4)
    m16 = 16
    msgs = jnp.asarray(np.arange(m16))
    ct4 = tlwe.lwe_encrypt_message(jax.random.key(22), sk4.lv0, msgs, m16,
                                   p4.tlwe_lv0.alpha)
    out4 = LutBootstrap().bootstrap_func(ct4, lambda x: (x * 3 + 1) % m16, m16, ck4)
    record("pbs_uint4", out4)
    check("UINT4 PBS, 3-limb digits (3x+1 mod 16)",
          list(tlwe.lwe_decrypt_message(out4, sk4.lv0, m16))
          == [(x * 3 + 1) % m16 for x in range(m16)])

    if "--small" in sys.argv:
        # N <= 1024 subset: CPU-feasible cross-backend check of the golden
        # vectors captured on TPU (bit-exact integer math => must match)
        golden_finalize()
        print(f"\nALL {PASS} CHECKS PASSED (--small subset, "
              f"{time.perf_counter() - t0:.0f}s total)")
        return

    # -- SECURITY_128_BIT_RADIX: fast radix arithmetic ----------------------
    # Certified margin at base-8 (7.3 sigma, p ~ 2e-13 — lut_margin with
    # the corrected 1/(4m) decision distance); base-16 runs here too at
    # ~3.7 sigma (documented p ~ 1e-4 — the CERTIFIED nibble set is below).
    pr = tfhe.SECURITY_128_BIT_RADIX
    skr = tfhe.SecretKey.generate(jax.random.key(30), pr)
    t1 = time.perf_counter()
    ckr = tfhe.CloudKey.generate(jax.random.key(31), skr)
    print(f"RADIX keygen: {time.perf_counter() - t1:.1f}s")
    trials = 256
    xs = rng.integers(0, 512, trials)
    ys = rng.integers(0, 512, trials)
    ra = models.encrypt_radix(jax.random.key(32), skr.lv0, xs, 3, pr, base_bits=3)
    rb = models.encrypt_radix(jax.random.key(33), skr.lv0, ys, 3, pr, base_bits=3)
    rsum = models.add_radix(ra, rb, ckr, base_bits=3)  # 5 PBS per add
    dec = np.asarray(models.decrypt_radix(rsum, skr.lv0, base_bits=3))
    check(
        "RADIX base-8 9-bit add, 7.3-sigma certified (256 trials, 1280 PBS)",
        (dec == (xs + ys) % 512).all(),
    )

    # -- SECURITY_128_BIT_NIBBLE: the certified base-16 headline ------------
    # The reference's "8-bit add in 3 PBS" (examples/lut_add_two_numbers.rs)
    # at ~6.5 sigma (p ~ 8e-11 per PBS, model) — any failure is a real bug.
    pn = tfhe.SECURITY_128_BIT_NIBBLE
    skn = tfhe.SecretKey.generate(jax.random.key(36), pn)
    t1 = time.perf_counter()
    ckn = tfhe.CloudKey.generate(jax.random.key(37), skn)
    print(f"NIBBLE keygen: {time.perf_counter() - t1:.1f}s")
    xs = rng.integers(0, 256, trials)
    ys = rng.integers(0, 256, trials)
    na = models.encrypt_radix(jax.random.key(38), skn.lv0, xs, 2, pn, base_bits=4)
    nb = models.encrypt_radix(jax.random.key(39), skn.lv0, ys, 2, pn, base_bits=4)
    nsum = models.add_radix(na, nb, ckn, base_bits=4)  # 3 PBS per add
    record("nibble_add", nsum)
    dec = np.asarray(models.decrypt_radix(nsum, skn.lv0, base_bits=4))
    check(
        "NIBBLE 8-bit add in 3 PBS, 6.5-sigma certified (256 trials, 768 PBS)",
        (dec == (xs + ys) % 256).all(),
    )

    # measured post-PBS noise must agree with the engineered margin
    from rs_tfhe_tpu.torus import f64_to_torus
    from rs_tfhe_tpu.utils.noise import lut_margin, measure_phase_noise

    enc_scale = 1.0 / (2.0 * 32)
    digs = np.stack([(dec >> 0) & 15, (dec >> 4) & 15], axis=-1)  # [trials, 2]
    expected_mu = np.uint32(
        [int(f64_to_torus(int(v) * enc_scale)) for v in digs.reshape(-1)]
    )
    noise = measure_phase_noise(
        np.asarray(nsum).reshape(-1, pn.n0 + 1), skn.lv0, expected_mu
    )
    sig_design, _ = lut_margin(pn, 32)
    sigma_meas = float(noise.std())
    # next-PBS input: 3 summands of this output noise + the modswitch floor
    var_ms = (pn.n0 + 1) * (1.0 / (2.0 * pn.n1)) ** 2 / 12.0
    sig_in = (1.0 / 128.0) / float(np.sqrt(3 * sigma_meas**2 + var_ms))
    print(f"  NIBBLE measured PBS-output noise std {sigma_meas:.2e} "
          f"=> {sig_in:.1f} sigma of base-16 margin (model {sig_design:.1f})")
    check("NIBBLE base-16 margin >= 6 sigma (measured-output model)", sig_in >= 6.0)

    # ciphertext x ciphertext multiplication (beyond the reference) at the
    # certified set: all three stages >= 6.5 sigma (lut_margin(pn, 32, 8))
    xs8 = rng.integers(0, 256, 32)
    ys8 = rng.integers(0, 256, 32)
    ma = models.encrypt_radix(jax.random.key(40), skn.lv0, xs8, 4, pn, base_bits=2)
    mb = models.encrypt_radix(jax.random.key(41), skn.lv0, ys8, 4, pn, base_bits=2)
    mprod = models.mul_radix(ma, mb, ckn, base_bits=2)
    record("mul_radix_nibble", mprod)
    mdec = np.asarray(models.decrypt_radix(mprod, skn.lv0, base_bits=2))
    check(
        "NIBBLE 8-bit x 8-bit ciphertext multiply (32 trials, 56 PBS each)",
        (mdec == xs8 * ys8).all(),
    )

    golden_finalize()

    print(f"\nALL {PASS} CHECKS PASSED "
          f"({time.perf_counter() - t0:.0f}s total)")


if __name__ == "__main__":
    main()
