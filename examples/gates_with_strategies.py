"""Bootstrap-strategy injection (reference: examples/gates_with_strategies.rs,
bootstrap_strategies.rs).

The Gates object accepts a pluggable bootstrap strategy — vanilla or
programmable-LUT — mirroring the reference's `Bootstrap` trait objects.

    python examples/gates_with_strategies.py
"""

import jax
import jax.numpy as jnp
import numpy as np
from _common import make_keys, parse_args

from rs_tfhe_tpu.bootstrap import LutBootstrap, VanillaBootstrap, default_bootstrap
from rs_tfhe_tpu.gates import Gates
from rs_tfhe_tpu.tlwe import lwe_decrypt_bool, lwe_encrypt_bool


def main():
    args = parse_args(__doc__)
    sk, ck = make_keys(args.param_set)
    alpha = args.param_set.tlwe_lv0.alpha

    bits_a = jnp.asarray([True, True, False, False])
    bits_b = jnp.asarray([True, False, True, False])
    ka, kb = jax.random.split(jax.random.key(3))
    a = lwe_encrypt_bool(ka, sk.lv0, bits_a, alpha)
    b = lwe_encrypt_bool(kb, sk.lv0, bits_b, alpha)

    for strategy in [None, VanillaBootstrap(), LutBootstrap()]:
        g = Gates(strategy)
        out = g.and_(a, b, ck)
        dec = list(np.asarray(lwe_decrypt_bool(out, sk.lv0)))
        print(f"strategy={g.bootstrap_strategy:>8}: AND(TTFF, TFTF) = {dec}")
        assert dec == [True, False, False, False]
    print("default:", default_bootstrap().name)


if __name__ == "__main__":
    main()
