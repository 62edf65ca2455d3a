"""Random-circuit equivalence: homomorphic evaluation of random gate DAGs
must match plaintext evaluation bit-for-bit — an integration property the
reference's per-gate truth-table tests never exercise (noise accumulation
across chained bootstraps, every gate type interleaved)."""

import jax
import jax.numpy as jnp
import numpy as np

from rs_tfhe_tpu import gates
from rs_tfhe_tpu.tlwe import lwe_decrypt_bool, lwe_encrypt_bool

GATE_FNS = {
    "nand": (gates.nand, lambda x, y: ~(x & y)),
    "and": (gates.and_, lambda x, y: x & y),
    "or": (gates.or_, lambda x, y: x | y),
    "nor": (gates.nor, lambda x, y: ~(x | y)),
    "xor": (gates.xor, lambda x, y: x ^ y),
    "xnor": (gates.xnor, lambda x, y: ~(x ^ y)),
    "and_ny": (gates.and_ny, lambda x, y: ~x & y),
    "and_yn": (gates.and_yn, lambda x, y: x & ~y),
    "or_ny": (gates.or_ny, lambda x, y: ~x | y),
    "or_yn": (gates.or_yn, lambda x, y: x | ~y),
}


def test_random_circuit_equivalence(sk, ck, rng):
    batch = 8
    n_inputs, n_gates = 4, 12
    names = list(GATE_FNS)

    plain = [rng.integers(0, 2, batch).astype(bool) for _ in range(n_inputs)]
    enc = [
        lwe_encrypt_bool(jax.random.key(100 + i), sk.lv0, jnp.asarray(p),
                         sk.params.tlwe_lv0.alpha)
        for i, p in enumerate(plain)
    ]

    for g in range(n_gates):
        name = names[rng.integers(0, len(names))]
        i, j = rng.integers(0, len(plain), 2)
        hom_fn, ref_fn = GATE_FNS[name]
        if rng.integers(0, 4) == 0:  # sprinkle bootstrap-free NOTs
            plain[i] = ~plain[i]
            enc[i] = gates.not_(enc[i])
        plain.append(ref_fn(plain[i], plain[j]))
        enc.append(hom_fn(enc[i], enc[j], ck))

    for k, (p, e) in enumerate(zip(plain, enc)):
        dec = np.asarray(lwe_decrypt_bool(e, sk.lv0))
        np.testing.assert_array_equal(dec, p, err_msg=f"wire {k}")


def test_deep_gate_chain(sk, ck, rng):
    """32 chained bootstraps: noise must stay bounded (refreshed every gate)."""
    bits = rng.integers(0, 2, 8).astype(bool)
    cur_p = bits
    cur = lwe_encrypt_bool(jax.random.key(200), sk.lv0, jnp.asarray(bits),
                           sk.params.tlwe_lv0.alpha)
    other_p = rng.integers(0, 2, 8).astype(bool)
    other = lwe_encrypt_bool(jax.random.key(201), sk.lv0, jnp.asarray(other_p),
                             sk.params.tlwe_lv0.alpha)
    for _ in range(32):
        cur = gates.nand(cur, other, ck)
        cur_p = ~(cur_p & other_p)
    dec = np.asarray(lwe_decrypt_bool(cur, sk.lv0))
    np.testing.assert_array_equal(dec, cur_p)
