"""Programmable bootstrapping across the Uint1-8 parameter sets
(reference: examples/lut_uint_parameters_demo.rs — which could not actually
switch sets, since the reference pins dimensions at compile time;
here every set is a runtime config).

Defaults to SECURITY_UINT4; runs a squaring LUT over all messages.

    python examples/lut_uint_parameters_demo.py --params SECURITY_UINT4
"""

import jax
import jax.numpy as jnp
import numpy as np
from _common import make_keys, parse_args

import rs_tfhe_tpu as tfhe
from rs_tfhe_tpu.bootstrap import LutBootstrap
from rs_tfhe_tpu.tlwe import lwe_decrypt_message, lwe_encrypt_message


def main():
    args = parse_args(__doc__)
    p = args.param_set if args.params != "TEST_TINY" else tfhe.TEST_TINY
    g = p.trgsw_lv1
    print(
        f"{args.params}: n0={p.n0} N={p.n1} L={g.l} bgbit={g.bgbit} "
        f"(digit limbs: {p.digit_limbs})"
    )
    sk, ck = make_keys(p)
    m = min(16, 2 ** max(1, p.security_bits)) if p.security_bits <= 8 else 8
    if args.params == "TEST_TINY":
        m = 4

    msgs = jnp.asarray(np.arange(m))
    ct = lwe_encrypt_message(jax.random.key(2), sk.lv0, msgs, m, p.tlwe_lv0.alpha)
    out = LutBootstrap().bootstrap_func(ct, lambda x: (x * x) % m, m, ck)
    got = list(lwe_decrypt_message(out, sk.lv0, m))
    exp = [(x * x) % m for x in range(m)]
    print(f"square mod {m}: {got}")
    assert got == exp, f"expected {exp}"
    print("OK")


if __name__ == "__main__":
    main()
