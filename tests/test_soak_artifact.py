"""The reliability-soak artifact (scripts/soak.py -> SOAK_r03.json) must
show zero decryption errors whenever it exists (VERDICT r2 item 3: the
p_fail headlines need hardware evidence, not just the noise model)."""

import json
import os

import pytest

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "SOAK_r03.json")


@pytest.mark.skipif(not os.path.exists(ART), reason="soak not yet run")
def test_soak_zero_errors():
    with open(ART) as f:
        art = json.load(f)
    fast, nib = art["fast"], art["nibble"]
    assert fast["errors"] == 0, f"FAST soak saw {fast['errors']} gate errors"
    assert nib["errors"] == 0, f"NIBBLE soak saw {nib['errors']} add errors"
    # the run must be big enough to back the README claims
    assert fast["gates"] >= 1_000_000
    assert nib["pbs"] >= 10_000
