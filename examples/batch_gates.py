"""Batched gate throughput scaling (reference: examples/batch_gates.rs,
batch_gates_scaling.rs).

The reference fans independent gates over CPU threads; here the batch axis IS
the hardware parallelism — one fused blind-rotation scan processes the whole
batch, and larger batches amortize the per-step evaluation-key expansion.

    python examples/batch_gates.py --params SECURITY_128_BIT
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from _common import make_keys, parse_args

from rs_tfhe_tpu.gates import batch_gate
from rs_tfhe_tpu.tlwe import lwe_decrypt_bool, lwe_encrypt_bool


def main():
    # --max_batch: largest batch in the sweep (CI smoke caps it on CPU)
    args = parse_args(__doc__, max_batch=1024)
    sk, ck = make_keys(args.param_set)
    alpha = args.param_set.tlwe_lv0.alpha
    rng = np.random.default_rng(0)

    print(f"{'batch':>6} {'total ms':>10} {'ms/gate':>9} {'gates/s':>9}")
    for batch in [b for b in [1, 8, 64, 256, 1024] if b <= args.max_batch]:
        bits_a = rng.integers(0, 2, batch).astype(bool)
        bits_b = rng.integers(0, 2, batch).astype(bool)
        ka, kb = jax.random.split(jax.random.key(3))
        a = lwe_encrypt_bool(ka, sk.lv0, jnp.asarray(bits_a), alpha)
        b = lwe_encrypt_bool(kb, sk.lv0, jnp.asarray(bits_b), alpha)

        out = batch_gate("nand", a, b, ck)  # compile
        dec = np.asarray(lwe_decrypt_bool(out, sk.lv0))
        assert (dec == ~(bits_a & bits_b)).all()

        t0 = time.perf_counter()
        cur = a
        iters = 3
        for _ in range(iters):
            cur = batch_gate("nand", cur, b, ck)
        np.asarray(jax.device_get(cur[0, -1]))
        dt = (time.perf_counter() - t0) / iters
        print(f"{batch:>6} {dt * 1e3:>10.1f} {dt / batch * 1e3:>9.3f} {batch / dt:>9.1f}")


if __name__ == "__main__":
    main()
