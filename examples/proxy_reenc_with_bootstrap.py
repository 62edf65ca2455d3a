"""Multi-hop proxy re-encryption interleaved with gate bootstraps
(reference: examples/proxy_reenc_with_bootstrap.rs, bootstrap_between_reenc.rs).

Each hop re-keys to the next party; a bootstrap between hops refreshes noise
so chains can extend indefinitely.

    python examples/proxy_reenc_with_bootstrap.py --hops 3
"""

import jax
import jax.numpy as jnp
import numpy as np
from _common import parse_args, timed

from rs_tfhe_tpu import gates, proxy_reenc as pre
from rs_tfhe_tpu.key import CloudKey, SecretKey
from rs_tfhe_tpu.tlwe import lwe_decrypt_bool, lwe_encrypt_bool


def main():
    args = parse_args(__doc__, hops=3)
    p = args.param_set

    parties = [SecretKey.generate(jax.random.key(i), p) for i in range(args.hops + 1)]
    bits = jnp.asarray([True, False, True, False])
    ct = lwe_encrypt_bool(jax.random.key(99), parties[0].lv0, bits, p.tlwe_lv0.alpha)

    for hop in range(args.hops):
        src, dst = parties[hop], parties[hop + 1]
        rk = pre.new_symmetric(jax.random.key(100 + hop), src.lv0, dst.lv0, p)
        ct = timed(f"hop {hop}: reencrypt {hop}->{hop + 1}", pre.reencrypt, ct, rk)
        # refresh noise under the destination key before the next hop
        ck_dst = CloudKey.generate(jax.random.key(200 + hop), dst)
        ct = timed(f"hop {hop}: bootstrap (AND with TRUE)",
                   lambda c: gates.and_(c, gates.constant(True, c.shape[0], p), ck_dst), ct)
        got = np.asarray(lwe_decrypt_bool(ct, dst.lv0))
        assert (got == np.asarray(bits)).all(), f"hop {hop} corrupted the message"
        print(f"hop {hop}: OK {list(got)}")
    print("chain OK")


if __name__ == "__main__":
    main()
