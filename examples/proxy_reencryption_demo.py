"""LWE proxy re-encryption, symmetric and asymmetric
(reference: examples/proxy_reencryption_demo.rs).

Alice's ciphertexts are re-keyed to Bob without decryption. Asymmetric mode
builds the re-encryption key from Bob's *public* key only.

    python examples/proxy_reencryption_demo.py
"""

import jax
import jax.numpy as jnp
import numpy as np
from _common import parse_args

from rs_tfhe_tpu import proxy_reenc as pre
from rs_tfhe_tpu.key import SecretKey
from rs_tfhe_tpu.tlwe import lwe_decrypt_bool, lwe_encrypt_bool


def main():
    args = parse_args(__doc__)
    p = args.param_set
    alice = SecretKey.generate(jax.random.key(0), p)
    bob = SecretKey.generate(jax.random.key(1), p)

    bits = jnp.asarray([True, False, True, True, False, False, True, False])
    ct = lwe_encrypt_bool(jax.random.key(2), alice.lv0, bits, p.tlwe_lv0.alpha)

    rk_sym = pre.new_symmetric(jax.random.key(3), alice.lv0, bob.lv0, p)
    got = np.asarray(lwe_decrypt_bool(pre.reencrypt(ct, rk_sym), bob.lv0))
    print("symmetric :", list(got))
    assert (got == np.asarray(bits)).all()

    pk_bob = pre.PublicKeyLv0.generate(jax.random.key(4), bob.lv0, p)
    rk_asym = pre.new_asymmetric(jax.random.key(5), alice.lv0, pk_bob, p)
    got = np.asarray(lwe_decrypt_bool(pre.reencrypt(ct, rk_asym), bob.lv0))
    print("asymmetric:", list(got))
    assert (got == np.asarray(bits)).all()
    print("OK")


if __name__ == "__main__":
    main()
