"""Bisect the 300 s FAST key-switching-key compile (scripts/diag_keygen.py:
ksk cold 301 s vs bsk 4.4 s). Each probe jits one stage of
key.gen_key_switching_key at the FAST shapes on a FRESH cache and reports
its cold compile+run time.

Usage: python scripts/diag_ksk_compile.py [probe ...]
Probes: mask  noise  dotcat  limbs  full  mask_part (threefry_partitionable)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache = tempfile.mkdtemp(prefix="jaxcache_ksk_")
jax.config.update("jax_compilation_cache_dir", cache)

from rs_tfhe_tpu import ALL_SECURITY_SETS  # noqa: E402
from rs_tfhe_tpu.key import SecretKey, gen_key_switching_key  # noqa: E402
from rs_tfhe_tpu.torus import (  # noqa: E402
    gaussian_torus,
    split_u32_limbs,
    uniform_torus,
)

params = ALL_SECURITY_SETS["SECURITY_128_BIT_FAST"]
G = params.trgsw_lv1
ROWS = params.n1 * G.iks_t * params.ks_base  # 36864
N0 = params.n0


def bench(name, fn, *args):
    t0 = time.perf_counter()
    out = jax.jit(fn)(*args)
    s = jnp.asarray(jnp.ravel(out)[0]).item()
    print(f"{name}: {time.perf_counter() - t0:.2f}s (v={s})", flush=True)


def main() -> None:
    probes = sys.argv[1:] or ["mask", "noise", "dotcat", "limbs", "full"]
    print(f"device={jax.devices()[0]} rows={ROWS} n0={N0} cache={cache}",
          flush=True)
    key = jax.random.key(7)
    sk = SecretKey.generate(jax.random.key(42), params)

    for p in probes:
        if p == "mask":
            bench("mask (uniform bits [rows, n0])",
                  lambda k: uniform_torus(k, (ROWS, N0)), key)
        elif p == "mask_part":
            jax.config.update("jax_threefry_partitionable", True)
            bench("mask partitionable",
                  lambda k: uniform_torus(k, (ROWS, N0)), key)
            jax.config.update("jax_threefry_partitionable", False)
        elif p == "noise":
            bench("noise (gaussian [rows])",
                  lambda k: gaussian_torus(k, 1e-5, (ROWS,)), key)
        elif p == "dotcat":
            def dotcat(a, noise, s):
                b = noise + jnp.sum(a * s, axis=-1, dtype=jnp.uint32)
                return jnp.concatenate([a, b[..., None]], axis=-1)
            a = jnp.zeros((ROWS, N0), jnp.uint32)
            nz = jnp.zeros((ROWS,), jnp.uint32)
            bench("dot+concat", dotcat, a, nz, sk.lv0)
        elif p == "sumonly":
            def sumonly(a, s):
                return jnp.sum(a * s, axis=-1, dtype=jnp.uint32)
            a = jnp.zeros((ROWS, N0), jnp.uint32)
            bench("sum(a*s) only", sumonly, a, sk.lv0)
        elif p == "catonly":
            def catonly(a, b):
                return jnp.concatenate([a, b[..., None]], axis=-1)
            a = jnp.zeros((ROWS, N0), jnp.uint32)
            b = jnp.zeros((ROWS,), jnp.uint32)
            bench("concat only", catonly, a, b)
        elif p == "dotgen":
            # same values mod 2^32: int32 MXU dot wraps (NOTES-PERF)
            def dotgen(a, s):
                ai = jax.lax.bitcast_convert_type(a, jnp.int32)
                return jax.lax.bitcast_convert_type(
                    jax.lax.dot_general(
                        ai, s.astype(jnp.int32)[:, None],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )[:, 0],
                    jnp.uint32,
                )
            a = jnp.zeros((ROWS, N0), jnp.uint32)
            bench("dot_general(a, s)", dotgen, a, sk.lv0)
        elif p == "scan_sum":
            # chunked reduce: identical values, per-fusion size / 36
            def scan_sum(a, s):
                ac = a.reshape(36, ROWS // 36, N0)
                def step(_, blk):
                    return None, jnp.sum(blk * s, axis=-1, dtype=jnp.uint32)
                _, bs = jax.lax.scan(step, None, ac)
                return bs.reshape(ROWS)
            a = jnp.zeros((ROWS, N0), jnp.uint32)
            bench("scan-chunked sum", scan_sum, a, sk.lv0)
        elif p == "limbs":
            rows = jnp.zeros((ROWS, N0 + 1), jnp.uint32)
            bench("limb split+reshape",
                  lambda r: split_u32_limbs(r).reshape(ROWS, (N0 + 1) * 4),
                  rows)
        elif p == "full":
            bench("full gen_key_switching_key",
                  lambda k: gen_key_switching_key(k, sk), key)
        elif p == "body":
            # one chunk of the scan body, standalone
            from rs_tfhe_tpu.torus import threefry2x32_bits
            cs = 1024
            def body(k, mu_c, noise_c, zero_c, s):
                a = threefry2x32_bits(k, 0, cs * N0).reshape(cs, N0)
                b = mu_c + noise_c + jnp.sum(a * s, axis=-1, dtype=jnp.uint32)
                row = jnp.concatenate([a, b[:, None]], axis=-1)
                row = jnp.where(zero_c[:, None], jnp.uint32(0), row)
                return split_u32_limbs(row).reshape(cs, (N0 + 1) * 4)
            bench("chunk body [1024]", body, key,
                  jnp.zeros((cs,), jnp.uint32), jnp.zeros((cs,), jnp.uint32),
                  jnp.zeros((cs,), bool), sk.lv0)
        elif p == "scan_nolimb":
            from rs_tfhe_tpu.torus import threefry2x32_bits
            cs = 1024
            steps = ROWS // cs
            def nolimb(k, mu, noise, zero, s):
                def step(start, x):
                    mu_c, noise_c, zero_c = x
                    a = threefry2x32_bits(k, start, cs * N0).reshape(cs, N0)
                    b = mu_c + noise_c + jnp.sum(a * s, axis=-1,
                                                 dtype=jnp.uint32)
                    row = jnp.concatenate([a, b[:, None]], axis=-1)
                    row = jnp.where(zero_c[:, None], jnp.uint32(0), row)
                    return start + jnp.uint32(cs * N0), row
                _, rows = jax.lax.scan(
                    step, jnp.uint32(0),
                    (mu.reshape(steps, cs), noise.reshape(steps, cs),
                     zero.reshape(steps, cs)))
                return rows.reshape(ROWS, N0 + 1)
            bench("scan no-limb", nolimb, key,
                  jnp.zeros((ROWS,), jnp.uint32), jnp.zeros((ROWS,), jnp.uint32),
                  jnp.zeros((ROWS,), bool), sk.lv0)
        elif p == "scan_limbonly":
            cs = 1024
            steps = ROWS // cs
            def limbonly(rows):
                def step(_, r):
                    return None, split_u32_limbs(r).reshape(cs, (N0 + 1) * 4)
                _, limbs = jax.lax.scan(
                    step, None, rows.reshape(steps, cs, N0 + 1))
                return limbs.reshape(ROWS, (N0 + 1) * 4)
            bench("scan limb-only", limbonly,
                  jnp.zeros((ROWS, N0 + 1), jnp.uint32))
        elif p in ("scan_padded", "scan_padded_nocompat"):
            # aligned-layout pipeline candidate: rows padded to a lane
            # multiple (768), body written via one-hot madd (no concat),
            # limbs PLANAR ([cs, 4, P] -> [cs, 4P], no interleave reshape).
            # "nocompat" also generates 768 counters/row (mask stream
            # changes; golden vectors would need regeneration).
            from rs_tfhe_tpu.torus import threefry2x32_bits
            cs = 1024
            steps = ROWS // cs
            P = 768
            compat = p == "scan_padded"

            def balanced_planar(x_u32):
                t = jax.lax.bitcast_convert_type(x_u32, jnp.int32)
                limbs = []
                cur = t
                for _ in range(3):
                    r = jnp.bitwise_and(cur, 255)
                    carry = (r >= 128).astype(jnp.int32)
                    limbs.append(r - 256 * carry)
                    cur = jnp.right_shift(cur, 8) + carry
                limbs.append(cur)
                return jnp.stack(limbs, axis=1).astype(jnp.int8)  # [cs,4,P]

            def padded(k, mu, noise, zero, s):
                e = (jax.lax.iota(jnp.uint32, P) == N0).astype(jnp.uint32)
                colmask = (jax.lax.iota(jnp.uint32, P) < N0).astype(jnp.uint32)
                s_pad = jnp.pad(s, (0, P - N0))

                def step(start, x):
                    mu_c, noise_c, zero_c = x
                    if compat:
                        bits = threefry2x32_bits(k, start, cs * N0)
                        a = jnp.pad(bits.reshape(cs, N0),
                                    ((0, 0), (0, P - N0)))
                        nxt = start + jnp.uint32(cs * N0)
                    else:
                        bits = threefry2x32_bits(k, start, cs * P)
                        a = bits.reshape(cs, P) * colmask[None, :]
                        nxt = start + jnp.uint32(cs * P)
                    b = mu_c + noise_c + jnp.sum(a * s_pad, axis=-1,
                                                 dtype=jnp.uint32)
                    row = a + b[:, None] * e[None, :]
                    row = jnp.where(zero_c[:, None], jnp.uint32(0), row)
                    limbs = balanced_planar(row).reshape(cs, 4 * P)
                    return nxt, limbs

                _, limbs = jax.lax.scan(
                    step, jnp.uint32(0),
                    (mu.reshape(steps, cs), noise.reshape(steps, cs),
                     zero.reshape(steps, cs)))
                return limbs.reshape(ROWS, 4 * P)

            bench(p, padded, key,
                  jnp.zeros((ROWS,), jnp.uint32), jnp.zeros((ROWS,), jnp.uint32),
                  jnp.zeros((ROWS,), bool), sk.lv0)
        elif p == "scan_threefryonly":
            from rs_tfhe_tpu.torus import threefry2x32_bits
            cs = 1024
            steps = ROWS // cs
            def tfonly(k):
                def step(start, _):
                    a = threefry2x32_bits(k, start, cs * N0).reshape(cs, N0)
                    return start + jnp.uint32(cs * N0), a[:, 0]
                _, c0 = jax.lax.scan(step, jnp.uint32(0), None, length=steps)
                return c0
            bench("scan threefry-only", tfonly, key)


if __name__ == "__main__":
    main()
