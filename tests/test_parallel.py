"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Mirrors the reference's batch-scaling tests (rs-tfhe trgsw.rs:548-648,
gates.rs:683-782) but validates *placement correctness* rather than speedup:
data-parallel and tensor-parallel results must decrypt identically to the
single-device path.
"""

import jax
import numpy as np
import pytest

from rs_tfhe_tpu import gates
from rs_tfhe_tpu.parallel import (
    data_parallel_gate,
    data_parallel_lut_bootstrap,
    data_parallel_mux,
    make_mesh,
    tensor_parallel_gate,
    tensor_parallel_lut_bootstrap,
)
from rs_tfhe_tpu.tlwe import (
    lwe_decrypt_bool,
    lwe_decrypt_message,
    lwe_encrypt_bool,
    lwe_encrypt_message,
)


def _enc_pairs(sk, rng, n):
    a_bits = rng.integers(0, 2, n).astype(bool)
    b_bits = rng.integers(0, 2, n).astype(bool)
    ka, kb = jax.random.split(jax.random.key(3))
    a = lwe_encrypt_bool(ka, sk.lv0, a_bits, sk.params.tlwe_lv0.alpha)
    b = lwe_encrypt_bool(kb, sk.lv0, b_bits, sk.params.tlwe_lv0.alpha)
    return a_bits, b_bits, a, b


def test_data_parallel_nand_matches_plaintext(sk, ck, rng):
    mesh = make_mesh(8)
    a_bits, b_bits, a, b = _enc_pairs(sk, rng, 11)  # non-divisible: pads
    out = data_parallel_gate("nand", a, b, ck, mesh)
    dec = np.asarray(lwe_decrypt_bool(out, sk.lv0))
    np.testing.assert_array_equal(dec, ~(a_bits & b_bits))


def test_data_parallel_matches_single_device(sk, ck, rng):
    mesh = make_mesh(4)
    _, _, a, b = _enc_pairs(sk, rng, 8)
    sharded = np.asarray(data_parallel_gate("xor", a, b, ck, mesh))
    single = np.asarray(gates.xor(a, b, ck))
    np.testing.assert_array_equal(sharded, single)


@pytest.mark.parametrize("tp", [2])  # tp must divide 2L = 6 (TEST_TINY l=3)
def test_tensor_parallel_bitexact_vs_single_device(sk, ck, rng, tp):
    """TP shards exact integer contractions -> results must be bit-identical."""
    mesh = make_mesh(8, tp=tp)
    _, _, a, b = _enc_pairs(sk, rng, 8)
    tp_out = np.asarray(tensor_parallel_gate("and", a, b, ck, mesh))
    single = np.asarray(gates.and_(a, b, ck))
    np.testing.assert_array_equal(tp_out, single)


def test_tensor_parallel_gate_decrypts(sk, ck, rng):
    mesh = make_mesh(8, tp=2)
    a_bits, b_bits, a, b = _enc_pairs(sk, rng, 8)
    out = tensor_parallel_gate("or", a, b, ck, mesh)
    dec = np.asarray(lwe_decrypt_bool(out, sk.lv0))
    np.testing.assert_array_equal(dec, a_bits | b_bits)


def test_data_parallel_mux_matches_single_device(sk, ck, rng):
    import jax.numpy as jnp

    mesh = make_mesh(4)
    s_bits, x_bits, s, x = _enc_pairs(sk, rng, 8)
    y_bits = rng.integers(0, 2, 8).astype(bool)
    y = lwe_encrypt_bool(
        jax.random.key(5), sk.lv0, jnp.asarray(y_bits), sk.params.tlwe_lv0.alpha
    )
    sharded = np.asarray(data_parallel_mux(s, x, y, ck, mesh))
    single = np.asarray(gates.mux(s, x, y, ck))
    np.testing.assert_array_equal(sharded, single)
    dec = np.asarray(lwe_decrypt_bool(sharded, sk.lv0))
    np.testing.assert_array_equal(dec, np.where(s_bits, x_bits, y_bits))


def test_data_parallel_lut_bootstrap(sk, ck, rng):
    import jax.numpy as jnp

    mesh = make_mesh(4)
    msgs = np.arange(8, dtype=np.uint32) % 4
    ct = lwe_encrypt_message(
        jax.random.key(6), sk.lv0, jnp.asarray(msgs), 4, sk.params.tlwe_lv0.alpha
    )
    out = data_parallel_lut_bootstrap(ct, lambda x: (3 * x) % 4, 4, ck, mesh)
    dec = np.asarray(lwe_decrypt_message(out, sk.lv0, 4))
    np.testing.assert_array_equal(dec, (3 * msgs) % 4)


def test_tensor_parallel_lut_bootstrap_bitexact(sk, ck, rng):
    import jax.numpy as jnp
    from rs_tfhe_tpu.bootstrap import LutBootstrap

    mesh = make_mesh(8, tp=2)
    msgs = np.arange(8, dtype=np.uint32) % 4
    ct = lwe_encrypt_message(
        jax.random.key(7), sk.lv0, jnp.asarray(msgs), 4, sk.params.tlwe_lv0.alpha
    )
    f = lambda x: (x + 2) % 4
    tp_out = np.asarray(tensor_parallel_lut_bootstrap(ct, f, 4, ck, mesh))
    single = np.asarray(LutBootstrap().bootstrap_func(ct, f, 4, ck))
    np.testing.assert_array_equal(tp_out, single)
    dec = np.asarray(lwe_decrypt_message(jnp.asarray(tp_out), sk.lv0, 4))
    np.testing.assert_array_equal(dec, (msgs + 2) % 4)
