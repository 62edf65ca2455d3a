"""Key-generation timing (reference: examples/test_keygen_speed.rs, which
documents 700 serial TRGSW encryptions at 50-100 ms each on CPU; here the
whole bootstrapping key is one batched tensor op).

    python examples/keygen_speed.py --params SECURITY_128_BIT
"""

import time

import jax
import numpy as np
from _common import parse_args

from rs_tfhe_tpu.key import CloudKey, SecretKey, gen_bootstrapping_key, gen_key_switching_key


def sync_scalar(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def main():
    args = parse_args(__doc__)
    p = args.param_set
    sk = SecretKey.generate(jax.random.key(42), p)
    sync_scalar(sk.lv0)

    for label, f in [
        ("key-switching key", lambda i: gen_key_switching_key(jax.random.key(i), sk)),
        ("bootstrapping key", lambda i: gen_bootstrapping_key(jax.random.key(i), sk)),
        ("full CloudKey", lambda i: CloudKey.generate(jax.random.key(i), sk)),
    ]:
        sync_scalar(f(0))  # compile
        t0 = time.perf_counter()
        sync_scalar(f(1))
        print(f"{label}: {(time.perf_counter() - t0) * 1e3:.0f} ms (warm)")


if __name__ == "__main__":
    main()
