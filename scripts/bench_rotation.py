"""Time the fused blind-rotation kernel end-to-end on the real TPU.

Usage: python scripts/bench_rotation.py [batch] [iters]
Env: RS_TFHE_BENCH_PARAMS (default SECURITY_128_BIT_FAST)

Chains iterations by feeding the (bit-twiddled) accumulator back into the
test vector so XLA cannot elide them; scalar host read as the barrier.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from rs_tfhe_tpu.params import ALL_SECURITY_SETS  # noqa: E402
from rs_tfhe_tpu.ops.pallas_blind_rotate import (  # noqa: E402
    fused_blind_rotate,
    fused_blind_rotate_wide,
    prepare_bsk_limbs,
)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    pname = os.environ.get("RS_TFHE_BENCH_PARAMS", "SECURITY_128_BIT_FAST")
    params = ALL_SECURITY_SETS[pname]
    n0, n1 = params.n0, params.n1

    rng = np.random.default_rng(0)
    b_til = jnp.asarray(rng.integers(0, 2 * n1, batch), jnp.int32)
    a_til = jnp.asarray(rng.integers(0, 2 * n1, (n0, batch)), jnp.int32)
    testvec = jnp.asarray(
        rng.integers(0, 1 << 32, (2, n1), dtype=np.uint32).astype(np.uint32)
    )
    bsk = jnp.asarray(
        rng.integers(0, 1 << 32, (n0, 2 * params.trgsw_lv1.l, 2, n1), dtype=np.uint32)
    )
    packed = prepare_bsk_limbs(bsk)
    print(f"params={pname} batch={batch} packed={packed.shape}", file=sys.stderr)

    drop = int(os.environ.get("RS_TFHE_DROP_LIMBS", "0"))
    fb = int(os.environ.get("RS_TFHE_FB", "128"))
    # RS_TFHE_WIDE=1 benches the step-major kernel; RS_TFHE_TILE sweeps its
    # per-program row count (the dots' M dim), RS_TFHE_SUPER its super-batch
    wide = os.environ.get("RS_TFHE_WIDE", "0") == "1"
    tile = int(os.environ.get("RS_TFHE_TILE", "128"))
    super_b = os.environ.get("RS_TFHE_SUPER")
    super_b = int(super_b) if super_b else None
    # RS_TFHE_JOINT=1: joint two-poly rotate/decompose (round-5 VPU A/B)
    joint = os.environ.get("RS_TFHE_JOINT", "0") == "1"

    @jax.jit
    def chained(tv, b, a, pk):
        acc = None
        for _ in range(iters):
            if wide:
                acc = fused_blind_rotate_wide(
                    b, a, tv, pk, params, drop_limbs=drop,
                    super_b=super_b, tile=tile, joint_rot=joint,
                )
            else:
                acc = fused_blind_rotate(
                    b, a, tv, pk, params, drop_limbs=drop, fb=fb,
                    joint_rot=joint,
                )
            tv = acc[0] ^ jnp.uint32(1)  # feed real data forward
        return acc

    t0 = time.perf_counter()
    out = chained(testvec, b_til, a_til, packed)
    _ = np.asarray(jax.device_get(jnp.ravel(out)[0]))
    print(f"compile+first: {time.perf_counter()-t0:.2f}s", file=sys.stderr)

    t0 = time.perf_counter()
    out = chained(testvec, b_til, a_til, packed)
    _ = np.asarray(jax.device_get(jnp.ravel(out)[0]))
    dt = (time.perf_counter() - t0) / iters
    print(
        f"rotation: {dt*1e3:.1f} ms/batch  {batch/dt:.0f} rot/s  "
        f"{dt/ (n0 * max(1, batch // fb)) * 1e6:.2f} us/program"
    )


if __name__ == "__main__":
    main()
