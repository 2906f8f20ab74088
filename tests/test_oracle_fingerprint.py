"""The oracle tree must be the one the parity suites were validated on.

CI fetches leap-stc/ClimSim from upstream; without a recorded SHA of the
local mirror, a branch ref would let upstream drift silently change the
golden values.  This test pins the oracle by content: every reference
file the refshim/torchshim suites execute must hash to the value recorded
in tests/oracle_fingerprint.json.  On drift it fails LOUDLY with the list
of changed files -- the correct response is to re-validate the parity
suites against the new tree and regenerate the pin
(``python -m tests.refshim.fingerprint --write``), never to ignore it.
"""

import os

import pytest

from refshim.fingerprint import compute_fingerprint, load_pinned

_REQUIRE = os.environ.get("CLIMSIM_REQUIRE_REFERENCE")
_ROOT = os.environ.get("CLIMSIM_REFERENCE", "/root/reference")


def test_oracle_fingerprint_matches_pin():
    if not os.path.isdir(_ROOT):
        if _REQUIRE:
            pytest.fail(f"CLIMSIM_REQUIRE_REFERENCE set but {_ROOT} absent")
        pytest.skip("reference tree not available")
    pinned = load_pinned()
    actual = compute_fingerprint(_ROOT)
    assert set(actual) == set(pinned), "oracle file list changed"
    drifted = sorted(rel for rel in pinned if actual[rel] != pinned[rel])
    assert not drifted, (
        "oracle tree drifted from the pinned content -- the parity suites "
        f"would assert against unvalidated golden values: {drifted}; "
        "re-validate, then `python -m tests.refshim.fingerprint --write`")
