"""Run ONLY the multi-bit soak phase and merge it into the existing
SOAK_r04.json (the full 10M-gate FAST/strict/nibble phases already ran;
re-running scripts/soak.py would overwrite them with whatever targets are
set). One-shot helper for adding the fast_mb row.

    python scripts/soak_mb_merge.py        # ~6-10 min on v5e
Env: RS_TFHE_SOAK_MB_GATES (default 3e5)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import soak  # noqa: E402  (scripts/soak.py)


def main() -> None:
    import jax

    assert jax.devices()[0].platform == "tpu"
    target = int(float(os.environ.get("RS_TFHE_SOAK_MB_GATES", "3e5")))
    print(f"soaking {target:.0e} FAST mb gates (B=2) ...", flush=True)
    mb = soak.soak_gates("SECURITY_128_BIT_FAST", target, key0=140,
                         batch=2, multibit=True)
    print(json.dumps(mb))
    with open(soak.OUT) as f:
        art = json.load(f)
    art["fast_mb"] = mb
    with open(soak.OUT, "w") as f:
        json.dump(art, f, indent=1)
    print(f"merged fast_mb into {soak.OUT}")
    sys.exit(0 if mb["errors"] == 0 else 1)


if __name__ == "__main__":
    main()
