"""Enumerate all parameter sets (reference: examples/security_levels.rs).

Unlike the reference — whose array dimensions are compile-time pinned to
SECURITY_128_BIT (params.rs:426-465), making the other ten sets unusable —
every set here is a runtime config: pass any of them to SecretKey.generate
and the whole pipeline specializes under jit.

    python examples/security_levels.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import rs_tfhe_tpu as tfhe


def main():
    print(f"{'name':<18} {'n0':>5} {'N':>5} {'L':>2} {'bgbit':>5} {'basebit':>7} {'iks_t':>5}  description")
    for name, p in tfhe.ALL_SECURITY_SETS.items():
        g = p.trgsw_lv1
        print(
            f"{name:<18} {p.n0:>5} {p.n1:>5} {g.l:>2} {g.bgbit:>5} {g.basebit:>7} "
            f"{g.iks_t:>5}  {p.description}"
        )
        print(f"{'':18} -> {tfhe.security_info(p)}")


if __name__ == "__main__":
    main()
