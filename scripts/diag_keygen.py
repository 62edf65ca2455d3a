"""Diagnose cold-keygen compile cost (VERDICT r02 weak #1: 368 s in the
driver bench vs 6.5 s in round 1).

Times, with a FRESH compilation cache (temp dir), either the fused
one-program keygen or a split per-component variant, on the default device.

Usage: python scripts/diag_keygen.py [fused|split] [PARAMS]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache = tempfile.mkdtemp(prefix="jaxcache_diag_")
jax.config.update("jax_compilation_cache_dir", cache)

from rs_tfhe_tpu import ALL_SECURITY_SETS  # noqa: E402
from rs_tfhe_tpu.key import (  # noqa: E402
    SecretKey,
    _generate_jit,
    gen_bootstrapping_key,
    gen_key_switching_key,
)
from rs_tfhe_tpu.ops.pallas_blind_rotate import prepare_bsk_limbs  # noqa: E402


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "fused"
    pname = sys.argv[2] if len(sys.argv) > 2 else "SECURITY_128_BIT_FAST"
    params = ALL_SECURITY_SETS[pname]
    print(f"device={jax.devices()[0]} mode={mode} params={pname} cache={cache}",
          flush=True)

    sk = SecretKey.generate(jax.random.key(42), params)
    jax.block_until_ready((sk.lv0, sk.lv1))
    key = jax.random.key(7)

    if mode == "fused":
        t0 = time.perf_counter()
        out = _generate_jit(key, sk)
        s = jnp.asarray(out[1].ravel()[0]).item()
        print(f"fused keygen cold: {time.perf_counter() - t0:.2f}s (s={s})",
              flush=True)
    else:
        k_ksk, k_bsk = jax.random.split(key)
        t0 = time.perf_counter()
        ksk = jax.jit(gen_key_switching_key)(k_ksk, sk)
        _ = jnp.asarray(ksk.ravel()[0]).item()
        t1 = time.perf_counter()
        print(f"ksk cold: {t1 - t0:.2f}s", flush=True)
        bsk = jax.jit(gen_bootstrapping_key)(k_bsk, sk)
        _ = jnp.asarray(bsk.ravel()[0]).item()
        t2 = time.perf_counter()
        print(f"bsk cold: {t2 - t1:.2f}s", flush=True)
        packed = jax.jit(prepare_bsk_limbs)(bsk)
        _ = jnp.asarray(packed.ravel()[0]).item()
        t3 = time.perf_counter()
        print(f"pack cold: {t3 - t2:.2f}s", flush=True)
        print(f"split total cold: {t3 - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
