"""Loader that executes the reference data_utils as a golden test oracle.

Installs the xrmini shim as `xarray` (plus stub `netCDF4` / `tensorflow`
modules) and imports /root/reference/climsim_utils/data_utils.py by path,
WITHOUT copying any reference code into this repo.  Used only by the
golden-parity tests; returns None when the reference tree is absent so
those tests skip cleanly elsewhere.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types
import warnings

# the oracle tree location; CI points this at a pinned-SHA clone of
# leap-stc/ClimSim (see .github/workflows/test.yaml)
REFERENCE_ROOT = os.environ.get("CLIMSIM_REFERENCE", "/root/reference")
REFERENCE_DATA_UTILS = os.path.join(
    REFERENCE_ROOT, "climsim_utils/data_utils.py")
REFERENCE_EXPANSION = os.path.join(
    REFERENCE_ROOT, "online_testing/data_preparation/"
    "expand_feature/climsim_adding_input.py")

_cache: dict = {}


def _load_under_shim(path: str, modname: str):
    if modname in _cache:
        return _cache[modname]
    if not os.path.exists(path):
        return None

    from . import xrmini

    saved = {}
    stubs = {"xarray": xrmini, "netCDF4": types.ModuleType("netCDF4")}
    # a stub tensorflow avoids a ~10 s import; the tests use the pytorch
    # backend so data_utils never touches tf attributes
    if "tensorflow" not in sys.modules:
        stubs["tensorflow"] = types.ModuleType("tensorflow")
    for name, mod in stubs.items():
        saved[name] = sys.modules.get(name)
        sys.modules[name] = mod
    try:
        spec = importlib.util.spec_from_file_location(modname, path)
        module = importlib.util.module_from_spec(spec)
        # the reference source carries pre-3.12 regex escapes ('\.')
        # that py3.12 compiles with a SyntaxWarning -- oracle-side
        # noise, silenced only around the oracle's own compilation
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", SyntaxWarning)
            spec.loader.exec_module(module)
    finally:
        for name, prev in saved.items():
            if prev is None:
                del sys.modules[name]
            else:
                sys.modules[name] = prev
    _cache[modname] = module
    return module


def load_data_utils():
    """Import the reference data_utils module under the shim, once."""
    return _load_under_shim(REFERENCE_DATA_UTILS, "_reference_data_utils")


def load_expansion_module():
    """Import the reference mlexpand feature-expansion script under the
    shim (climsim_adding_input.py)."""
    return _load_under_shim(REFERENCE_EXPANSION, "_reference_expansion")
