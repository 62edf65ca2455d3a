"""Key checkpoint/resume (new capability — the reference has no persistence,
SURVEY.md §5).

    python examples/key_serialization.py
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
from _common import make_keys, parse_args

from rs_tfhe_tpu import gates
from rs_tfhe_tpu.tlwe import lwe_decrypt_bool, lwe_encrypt_bool
from rs_tfhe_tpu.utils.serialization import (
    load_cloud_key,
    load_secret_key,
    save_cloud_key,
    save_secret_key,
)


def main():
    args = parse_args(__doc__)
    sk, ck = make_keys(args.param_set)

    with tempfile.TemporaryDirectory() as d:
        skp, ckp = os.path.join(d, "sk.npz"), os.path.join(d, "ck.npz")
        ckps = os.path.join(d, "ck_seeded.npz")
        save_secret_key(skp, sk)
        save_cloud_key(ckp, ck)
        # seeded: ship only the generate seed + ciphertext bodies; the key
        # masks are replayed bit-exactly at load (9.8x smaller at the
        # 128-bit sets)
        save_cloud_key(ckps, ck, seeded=True)
        print(f"secret key        : {os.path.getsize(skp) / 1e3:.1f} kB")
        print(f"cloud key         : {os.path.getsize(ckp) / 1e6:.1f} MB")
        print(f"cloud key (seeded): {os.path.getsize(ckps) / 1e6:.1f} MB")

        sk2, ck2 = load_secret_key(skp), load_cloud_key(ckps)
        np.testing.assert_array_equal(np.asarray(ck2.bsk), np.asarray(ck.bsk))

    bits = jnp.asarray([True, False])
    a = lwe_encrypt_bool(jax.random.key(2), sk2.lv0, bits, args.param_set.tlwe_lv0.alpha)
    out = gates.nand(a, a, ck2)
    got = np.asarray(lwe_decrypt_bool(out, sk2.lv0))
    assert (got == [False, True]).all()
    print("reloaded keys evaluate correctly: OK")


if __name__ == "__main__":
    main()
