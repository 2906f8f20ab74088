"""Content fingerprint of the reference oracle files.

The golden-parity (tests/refshim) and model-parity (tests/torchshim)
suites execute leap-stc/ClimSim's own code as the numerical oracle.  CI
fetches that tree from upstream, and upstream drift would silently change
the golden values the suites assert against (no SHA of the local mirror
is recorded anywhere, so a branch ref cannot be trusted).  This module
pins the oracle by CONTENT instead: sha256 of every reference file the
suites import, stored in tests/oracle_fingerprint.json and verified by
tests/test_oracle_fingerprint.py before the parity suites run.

Regenerate (only after re-validating the parity suites against the new
tree): ``python -m tests.refshim.fingerprint --write``.
"""

from __future__ import annotations

import hashlib
import json
import os

REFERENCE_ROOT = os.environ.get("CLIMSIM_REFERENCE", "/root/reference")
FINGERPRINT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "oracle_fingerprint.json")

# every reference file some parity suite loads by path (refshim /
# torchshim) -- relative to the oracle tree root
ORACLE_FILES = [
    "climsim_utils/data_utils.py",
    "online_testing/data_preparation/expand_feature/"
    "climsim_adding_input.py",
    "online_testing/baseline_models/Unet_v5/training/climsim_unet.py",
    "online_testing/baseline_models/Unet_v5/training/layers.py",
    "online_testing/baseline_models/Unet_v5/training/loss_energy.py",
    "online_testing/baseline_models/Unet_v4/training/climsim_unet.py",
    "online_testing/baseline_models/Unet_v4/training/layers.py",
    "online_testing/baseline_models/MLP_v2rh/training/mlp.py",
    "baseline_models/HSR/training/hsr.py",
    "baseline_models/HSR/training/tools.py",       # imported by hsr.py
    "baseline_models/cVAE/training/cvae.py",
    "baseline_models/cVAE/training/tools.py",      # imported by cvae.py
    # coupling-wrapper notebooks: test_wrapper_parity.py executes their
    # NewModel cells as the oracle for the E3SM array contract
    "online_testing/model_postprocessing/v5_nn_wrapper.ipynb",
    "online_testing/model_postprocessing/v4_nn_wrapper.ipynb",
    "online_testing/model_postprocessing/v2_nn_wrapper.ipynb",
    "baseline_models/MLP/training/HPO/baseline_v1/hpo_baseline_v1.py",
    "baseline_models/CNN/training/hpo_train.py",
    "baseline_models/ED/training/ClimSIM_ED_1_3_train.py",
]


def compute_fingerprint(root: str = REFERENCE_ROOT) -> dict:
    """sha256 per oracle file (missing files hash to 'ABSENT')."""
    out = {}
    for rel in ORACLE_FILES:
        path = os.path.join(root, rel)
        if not os.path.isfile(path):
            out[rel] = "ABSENT"
            continue
        with open(path, "rb") as f:
            out[rel] = hashlib.sha256(f.read()).hexdigest()
    return out


def load_pinned() -> dict:
    with open(FINGERPRINT_PATH) as f:
        return json.load(f)


if __name__ == "__main__":
    import sys

    fp = compute_fingerprint()
    if "--write" in sys.argv:
        with open(FINGERPRINT_PATH, "w") as f:
            json.dump(fp, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {FINGERPRINT_PATH} ({len(fp)} files)")
    else:
        print(json.dumps(fp, indent=1, sort_keys=True))
