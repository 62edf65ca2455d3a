"""8-bit addition in 3 programmable bootstraps via nibble LUTs
(reference: examples/lut_add_two_numbers.rs, README.md:220).

    python examples/lut_add_two_numbers.py --params SECURITY_128_BIT --x 137 --y 205
"""

import jax
from _common import make_keys, parse_args, timed

from rs_tfhe_tpu import models


def main():
    args = parse_args(__doc__, x=137, y=205)
    sk, ck = make_keys(args.param_set)
    base_bits = 3 if args.param_set.n1 >= 1024 else 2
    num_digits = -(-8 // base_bits)  # ceil: 3 digits of 3 bits covers 8-bit
    mod = 1 << (base_bits * num_digits)

    a = models.encrypt_radix(jax.random.key(2), sk.lv0, args.x % mod, num_digits, args.param_set, base_bits)
    b = models.encrypt_radix(jax.random.key(3), sk.lv0, args.y % mod, num_digits, args.param_set, base_bits)

    out = timed(f"radix add ({2 * num_digits - 1} PBS)", models.add_radix, a, b, ck, base_bits)
    got = int(models.decrypt_radix(out, sk.lv0, base_bits))
    print(f"{args.x % mod} + {args.y % mod} = {got} (expect {(args.x + args.y) % mod})")
    assert got == (args.x + args.y) % mod
    print("OK")


if __name__ == "__main__":
    main()
