"""Generate tests/vectors/golden_tiny.npz — fixed-seed outputs of the full
pipeline at TEST_TINY, pinning bit-exact behavior across rounds (VERDICT
round-1 item 3). Run ONLY when an intentional numeric change lands; the
accompanying test (tests/test_golden_vectors.py) fails loudly on any drift.

Every stage is deterministic given the jax.random seeds below, so these
vectors are reproducible on any backend (tests force CPU).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# force CPU (the axon TPU plugin overrides JAX_PLATFORMS): the vectors are
# bit-exact on every backend and CPU compiles TEST_TINY in seconds
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from rs_tfhe_tpu import gates
from rs_tfhe_tpu.bootstrap import LutBootstrap
from rs_tfhe_tpu.key import CloudKey, SecretKey
from rs_tfhe_tpu.ops.blind_rotate import blind_rotate
from rs_tfhe_tpu.ops.extract import sample_extract
from rs_tfhe_tpu.ops.keyswitch import identity_key_switch
from rs_tfhe_tpu.params import TEST_TINY
from rs_tfhe_tpu.tlwe import lwe_encrypt_bool, lwe_encrypt_message

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "vectors",
                   "golden_tiny.npz")


def main():
    p = TEST_TINY
    sk = SecretKey.generate(jax.random.key(777), p)
    ck = CloudKey.generate(jax.random.key(778), sk)

    bits = jnp.asarray([True, False, True, True, False, False, True, False])
    a = lwe_encrypt_bool(jax.random.key(779), sk.lv0, bits, p.tlwe_lv0.alpha)
    b = lwe_encrypt_bool(jax.random.key(780), sk.lv0, ~bits, p.tlwe_lv0.alpha)

    lin = gates._nand_lin(a, b)
    acc = blind_rotate(lin, ck.testvec, ck.bsk, p,
                       bsk_packed=ck.bsk_packed)
    lv1 = sample_extract(acc)
    ks = identity_key_switch(lv1, ck.ksk_limbs, p)
    nand = gates.nand(a, b, ck)
    mux = gates.mux(a, b, a, ck)

    msgs = jnp.asarray([0, 1, 2, 3, 4, 5, 6, 7], jnp.uint32)
    ct_m = lwe_encrypt_message(jax.random.key(781), sk.lv0, msgs, 8,
                               p.tlwe_lv0.alpha)
    pbs = LutBootstrap().bootstrap_func(ct_m, lambda v: (v * 5 + 1) % 8, 8, ck)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(
        OUT,
        sk_lv0=np.asarray(sk.lv0),
        sk_lv1=np.asarray(sk.lv1),
        bsk_row0=np.asarray(ck.bsk[0]),
        ksk_limbs_head=np.asarray(ck.ksk_limbs[:64]),
        ct_a=np.asarray(a),
        blind_rotate_out=np.asarray(acc),
        extract_out=np.asarray(lv1),
        keyswitch_out=np.asarray(ks),
        nand_out=np.asarray(nand),
        mux_out=np.asarray(mux),
        pbs_out=np.asarray(pbs),
    )
    print(f"wrote {OUT}")
    for k, v in np.load(OUT).items():
        print(f"  {k}: {v.shape} {v.dtype}")


if __name__ == "__main__":
    main()
