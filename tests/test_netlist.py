"""Circuit scheduler (csrc/circuit_scheduler.cpp + models/netlist.py):
native/Python plan parity, dependency correctness, and end-to-end batched
evaluation of the reference's ripple-carry adder netlist."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_tfhe_tpu import native
from rs_tfhe_tpu.bit_utils import encrypt_uint
from rs_tfhe_tpu.models import netlist as NL
from rs_tfhe_tpu.tlwe import lwe_decrypt_bool, lwe_encrypt_bool


def _random_circuit(rng, n_inputs=6, n_gates=40):
    ckt = NL.Circuit(n_inputs=n_inputs)
    two_in = [op for op, (_, ar) in NL.OPS.items() if ar == 2]
    for _ in range(n_gates):
        avail = ckt.n_wires
        op = two_in[rng.integers(0, len(two_in))]
        if rng.random() < 0.1:
            ckt.add("not", int(rng.integers(0, avail)))
        elif rng.random() < 0.1:
            ckt.add("mux", int(rng.integers(0, avail)),
                    int(rng.integers(0, avail)), int(rng.integers(0, avail)))
        else:
            ckt.add(op, int(rng.integers(0, avail)), int(rng.integers(0, avail)))
    return ckt


def test_plan_native_matches_python(rng):
    if not native.available():
        pytest.skip("native runtime unavailable")
    for seed in range(3):
        ckt = _random_circuit(np.random.default_rng(seed))
        p_py = NL.plan_python(ckt)
        p_nat = NL.plan_native(ckt)
        np.testing.assert_array_equal(p_py.levels, p_nat.levels)
        np.testing.assert_array_equal(p_py.order, p_nat.order)
        assert p_py.groups == p_nat.groups
        assert p_py.n_levels == p_nat.n_levels


def test_plan_respects_dependencies(rng):
    ckt = _random_circuit(np.random.default_rng(7))
    p = NL.plan(ckt)
    producer_level = {}
    for g, gate in enumerate(ckt.gates):
        producer_level[gate.out] = int(p.levels[g])
    for g, gate in enumerate(ckt.gates):
        for w in (gate.a, gate.b, gate.c):
            if w is not None and w >= ckt.n_inputs:
                assert producer_level[w] < int(p.levels[g]), (g, w)
    # groups are contiguous, level-ordered, single-op
    seen = 0
    for start, end, opname, level in p.groups:
        assert start == seen
        for i in range(start, end):
            g = int(p.order[i])
            assert ckt.gates[g].op == opname
            assert int(p.levels[g]) == level
        seen = end
    assert seen == len(ckt.gates)


def test_plan_rejects_cycles_and_bad_wires():
    ckt = NL.Circuit(n_inputs=2)
    ckt.add("and", 0, 3, out=2)  # reads wire 3...
    ckt.add("or", 2, 1, out=3)   # ...which this writes: a cycle
    with pytest.raises(ValueError):
        NL.plan_python(ckt)
    if native.available():
        with pytest.raises(ValueError):
            NL.plan_native(ckt)

    bad = NL.Circuit(n_inputs=2)
    bad.add("and", 0, 99)  # out-of-range wire
    with pytest.raises(ValueError):
        NL.plan_python(bad)


def test_ripple_carry_adder_netlist_end_to_end(tiny, sk, ck, rng):
    """The reference's 80-gate-class adder circuit, scheduled and batch-
    evaluated: 8-bit add decrypts correctly and the plan compresses the
    gate count into far fewer batched calls."""
    w = 8
    ckt, a_w, b_w, sum_w = NL.ripple_carry_adder(w)
    x, y = 173, 90
    enc_a = encrypt_uint(jax.random.key(1), sk.lv0, x, w, tiny.tlwe_lv0.alpha)
    enc_b = encrypt_uint(jax.random.key(2), sk.lv0, y, w, tiny.tlwe_lv0.alpha)
    inputs = jnp.concatenate([enc_a, enc_b], axis=0)

    p = NL.plan(ckt)
    assert len(p.groups) < len(ckt.gates)  # scheduling actually batches
    wires = NL.evaluate(ckt, inputs, ck, p)
    out_bits = np.asarray(lwe_decrypt_bool(wires[np.asarray(sum_w)], sk.lv0))
    got = sum(int(bit) << i for i, bit in enumerate(out_bits))
    assert got == (x + y) % (1 << w), (got, (x + y) % (1 << w))


def test_mux_and_not_in_scheduled_circuit(tiny, sk, ck, rng):
    """not/copy (bootstrap-free) and mux (3-input) route correctly through
    grouped execution."""
    ckt = NL.Circuit(n_inputs=3)
    ns = ckt.add("not", 0)           # ~s
    m1 = ckt.add("mux", 0, 1, 2)     # s ? x : y
    m2 = ckt.add("mux", ns, 1, 2)    # ~s ? x : y
    x1 = ckt.add("xor", m1, m2)      # x XOR y when s differs... = x^y
    bits = np.array([True, True, False])
    enc = lwe_encrypt_bool(jax.random.key(3), sk.lv0, jnp.asarray(bits),
                           tiny.tlwe_lv0.alpha)
    wires = NL.evaluate(ckt, enc, ck)
    dec = np.asarray(lwe_decrypt_bool(wires, sk.lv0))
    s, x, y = bits
    assert dec[m1] == (x if s else y)
    assert dec[m2] == (y if s else x)
    assert dec[x1] == ((x if s else y) ^ (y if s else x))


def test_compile_circuit_matches_evaluate(sk, ck):
    """The whole-plan jitted runner (netlist.compile_circuit) produces the
    same decrypted outputs as the per-group evaluate()."""
    import jax.numpy as jnp

    from rs_tfhe_tpu.bit_utils import decrypt_uint, encrypt_uint
    from rs_tfhe_tpu.models import netlist

    ckt, _, _, sums = netlist.ripple_carry_adder(6)
    x, y = 41, 22
    alpha = sk.params.tlwe_lv0.alpha
    ea = encrypt_uint(jax.random.key(8), sk.lv0, x, 6, alpha)
    eb = encrypt_uint(jax.random.key(9), sk.lv0, y, 6, alpha)
    inputs = jnp.concatenate([ea, eb], axis=0)
    run = netlist.compile_circuit(ckt)
    wires = run(inputs, ck)
    got = decrypt_uint(wires[jnp.asarray(sums)], sk.lv0)
    assert int(got) == (x + y) % 64
