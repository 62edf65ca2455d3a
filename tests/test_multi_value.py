"""Multi-value programmable bootstrapping (lut.multi_value).

One blind rotation, many LUT outputs via test-vector factoring through
c * (1 + X + ... + X^{N-1}) — a capability the reference does not have
(one test vector per bootstrap, bootstrap/lut.rs:49-65). Checks:

- the factoring identity tv0 * w_k == tv_k is EXACT (schoolbook negacyclic
  oracle, zero tolerance) — the plaintext path is bit-identical to a
  dedicated rotation per LUT;
- multi_value_bootstrap decodes identically to per-LUT bootstraps;
- add_radix / compare_radix multi_value=True agree with the default path;
- the margin model: factoring norms scale only the accumulator term, and
  the certified radix sets keep their certification with the measured
  norms (utils.noise.lut_margin mv_norm).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_tfhe_tpu.bootstrap import bootstrap_with_testvec
from rs_tfhe_tpu.lut.generator import Generator
from rs_tfhe_tpu.lut.multi_value import (
    factor_test_vectors,
    multi_value_bootstrap,
)
from rs_tfhe_tpu.models.arithmetic import (
    _add_mv,
    _cmp_mv,
    add_radix,
    compare_radix,
    decrypt_radix,
    encrypt_radix,
)
from rs_tfhe_tpu.ops.poly import schoolbook_negacyclic
from rs_tfhe_tpu.params import (
    SECURITY_128_BIT_NIBBLE,
    SECURITY_128_BIT_RADIX,
    TEST_TINY,
)
from rs_tfhe_tpu.tlwe import lwe_decrypt_bool, lwe_decrypt_message, lwe_encrypt_message
from rs_tfhe_tpu.utils.noise import lut_margin


def _factored_product_equals(mv, polys):
    """tv0 * w_k == polys[k] exactly (negacyclic, mod 2^32)."""
    tv0b = np.asarray(mv.tv0)[1].astype(np.int64)
    for k, poly in enumerate(polys):
        w = np.zeros(tv0b.size, np.int64)
        for pos, cf in mv.terms[k]:
            w[pos] = cf if cf < 1 << 31 else cf - (1 << 32)
        got = np.asarray(schoolbook_negacyclic(tv0b, w)).astype(np.uint32)
        np.testing.assert_array_equal(got, np.asarray(poly)[1], err_msg=f"lut {k}")


def test_factoring_identity_exact_tiny():
    gen = Generator(8, TEST_TINY)
    polys = [
        gen.generate_lookup_table(lambda x: x % 4).poly,
        gen.generate_lookup_table(lambda x: x // 4).poly,
        gen.generate_lookup_table(lambda x: (3 * x + 1) % 8).poly,
    ]
    mv = factor_test_vectors(polys)
    assert mv.n_luts == 3
    _factored_product_equals(mv, polys)


def test_factoring_identity_exact_production_sets():
    """The production radix/nibble LUT families factor exactly too (host
    math only — no keys needed)."""
    for params, bb in ((SECURITY_128_BIT_RADIX, 3), (SECURITY_128_BIT_NIBBLE, 4)):
        base = 1 << bb
        gen = Generator(2 * base, params)
        polys = [
            gen.generate_lookup_table(lambda x: x % base).poly,
            gen.generate_lookup_table(lambda x: x // base).poly,
        ]
        mv = factor_test_vectors(polys)
        _factored_product_equals(mv, polys)
        # carry LUT norm is tiny; sum LUT norm ~ sqrt(2)*base
        assert mv.norms[1] < 3.0
        assert mv.norms[0] < 2.1 * base


def test_factoring_rejects_nontrivial_mask():
    poly = jnp.stack([jnp.ones(64, jnp.uint32), jnp.zeros(64, jnp.uint32)])
    with pytest.raises(ValueError, match="trivial"):
        factor_test_vectors([poly])


def test_multi_value_bootstrap_matches_per_lut(sk, ck):
    p = TEST_TINY
    modulus = 8
    gen = Generator(modulus, p)
    fns = [lambda x: x % 4, lambda x: x // 4, lambda x: (x * 5 + 1) % 8]
    polys = [gen.generate_lookup_table(f).poly for f in fns]
    mv = factor_test_vectors(polys)
    msgs = jnp.arange(modulus, dtype=jnp.uint32)
    ct = lwe_encrypt_message(
        jax.random.key(90), sk.lv0, msgs, modulus, p.tlwe_lv0.alpha
    )
    out = multi_value_bootstrap(ct, mv, ck)
    assert out.shape == (modulus, 3, p.n0 + 1)
    for k, poly in enumerate(polys):
        got = np.asarray(lwe_decrypt_message(out[..., k, :], sk.lv0, modulus))
        ref = np.asarray(
            lwe_decrypt_message(
                bootstrap_with_testvec(ct, poly, ck), sk.lv0, modulus
            )
        )
        np.testing.assert_array_equal(got, ref, err_msg=f"lut {k}")


BASE_BITS = 2  # modulus 8 fits TEST_TINY's N=64 table (see test_models.py)


def test_add_radix_multi_value(sk, ck):
    d = 3
    hi = 1 << (BASE_BITS * d)
    xs = np.array([5, 60, 33, 0], np.uint32)
    ys = np.array([9, 17, 30, 63], np.uint32)
    a = encrypt_radix(jax.random.key(91), sk.lv0, xs, d, sk.params,
                      base_bits=BASE_BITS)
    b = encrypt_radix(jax.random.key(92), sk.lv0, ys, d, sk.params,
                      base_bits=BASE_BITS)
    got = decrypt_radix(
        add_radix(a, b, ck, BASE_BITS, multi_value=True), sk.lv0, BASE_BITS
    )
    np.testing.assert_array_equal(np.asarray(got), (xs + ys) % hi)


def test_margin_model_multi_value():
    """Certified sets stay certified with the actual factoring norms."""
    for params, bb, floor in (
        (SECURITY_128_BIT_RADIX, 3, 7.0),
        (SECURITY_128_BIT_NIBBLE, 4, 6.0),
    ):
        mv = _add_mv(bb, params)
        base = 1 << bb
        # carry feeds the next digit's 3-summand PBS decision
        sig_in, _ = lut_margin(params, 2 * base, 3, mv_norm=mv.norms[1])
        assert sig_in >= floor, (params.description, sig_in)
        # sum digit decodes client-side: 1 summand, no further modswitch —
        # conservatively reuse the modswitch-inclusive bound
        sig_out, _ = lut_margin(params, 2 * base, 1, mv_norm=mv.norms[0])
        assert sig_out >= floor, (params.description, sig_out)
        # compare families
        cm = _cmp_mv(bb, params)
        worst = max(max(cm["leaf"].norms), max(cm["comb"].norms))
        sig_cmp, _ = lut_margin(params, 16, 2, mv_norm=worst)
        assert sig_cmp >= floor, (params.description, sig_cmp)
        # margins move < 2% vs the unfactored path
        base_sig, _ = lut_margin(params, 2 * base, 3)
        assert sig_in >= 0.98 * base_sig
