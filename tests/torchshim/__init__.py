"""Loaders that execute the reference's *model* code as golden oracles.

Counterpart of tests/refshim (which oracles the data pipeline through the
reference data_utils): this package imports the reference's runnable torch
and Keras model sources by path -- ClimsimUnet + layers.py (which need only
a mini-``modulus``/``nvtx`` shim), HSR/cVAE (plain torch), loss_energy, the
online MLP_v2rh, and the TF-Keras MLP/ED/CNN builders (which need
``keras_tuner`` / ``tensorflow_addons`` stubs) -- WITHOUT copying any
reference code into this repo.  Every loader returns None when the
reference tree is absent so parity tests skip cleanly elsewhere.

Shim inventory (each replaces an uninstalled dependency with the minimal
surface the reference files actually touch):

* ``modulus``       -- ``Module`` == torch.nn.Module taking a ``meta`` kwarg;
                       ``ModelMetaData`` == plain base class;
                       ``modulus.models.diffusion.weight_init`` == the
                       EDM-style initializer (xavier/kaiming x scale).
* ``nvtx``          -- no-op annotate decorators.
* ``keras_tuner``   -- ``HyperModel`` base providing the ``_build_wrapper``
                       indirection hpo_baseline_v1.MyHyperModel.__init__
                       relies on; ``FixedHp`` stands in for the ``hp``
                       object (Int/Choice/Float return defaults).
* ``tensorflow_addons`` -- ``tfa.optimizers.CyclicalLearningRate`` returns
                       the initial LR as a float (forward parity only; LR
                       schedules are tested against our own schedules.py);
                       ``RectifiedAdam`` aliases Adam.
* ``keras.layers.convolutional`` -- Keras-3 compat alias for the CNN
                       script's ``from keras.layers.convolutional import
                       Conv1D``.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

# the oracle tree location; CI points this at a pinned-SHA clone of
# leap-stc/ClimSim (see .github/workflows/test.yaml)
REFERENCE_ROOT = os.environ.get("CLIMSIM_REFERENCE", "/root/reference")
UNET_V5_DIR = os.path.join(
    REFERENCE_ROOT, "online_testing/baseline_models/Unet_v5/training")
UNET_V4_DIR = os.path.join(
    REFERENCE_ROOT, "online_testing/baseline_models/Unet_v4/training")
MLP_V2RH_DIR = os.path.join(
    REFERENCE_ROOT, "online_testing/baseline_models/MLP_v2rh/training")
HSR_DIR = os.path.join(REFERENCE_ROOT, "baseline_models/HSR/training")
CVAE_DIR = os.path.join(REFERENCE_ROOT, "baseline_models/cVAE/training")
KERAS_MLP_PATH = os.path.join(
    REFERENCE_ROOT,
    "baseline_models/MLP/training/HPO/baseline_v1/hpo_baseline_v1.py")
KERAS_CNN_PATH = os.path.join(
    REFERENCE_ROOT, "baseline_models/CNN/training/hpo_train.py")
KERAS_ED_PATH = os.path.join(
    REFERENCE_ROOT, "baseline_models/ED/training/ClimSIM_ED_1_3_train.py")

_cache: dict = {}


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


# --------------------------------------------------------------------------
# torch-side shims
# --------------------------------------------------------------------------

def _make_modulus_shim():
    """Minimal `modulus` package: Module, ModelMetaData, and the EDM-style
    weight_init imported by layers.py (`from modulus.models.diffusion
    import weight_init`).  The initializer formulas follow the public
    EDM/Modulus convention; exact init values are irrelevant to the parity
    tests (weights are ported), only shapes/dtypes matter."""
    import numpy as np
    import torch

    modulus = types.ModuleType("modulus")

    class ModelMetaData:
        name: str = "shim"

        def __init__(self, *a, **k):
            pass

    class Module(torch.nn.Module):
        def __init__(self, meta=None):
            super().__init__()
            self.meta = meta

    modulus.Module = Module
    modulus.ModelMetaData = ModelMetaData

    models_mod = types.ModuleType("modulus.models")
    diffusion_mod = types.ModuleType("modulus.models.diffusion")

    def weight_init(shape, mode, fan_in, fan_out):
        if mode == "xavier_uniform":
            return np.sqrt(6 / (fan_in + fan_out)) * (
                torch.rand(*shape) * 2 - 1)
        if mode == "xavier_normal":
            return np.sqrt(2 / (fan_in + fan_out)) * torch.randn(*shape)
        if mode == "kaiming_uniform":
            return np.sqrt(3 / fan_in) * (torch.rand(*shape) * 2 - 1)
        if mode == "kaiming_normal":
            return np.sqrt(1 / fan_in) * torch.randn(*shape)
        raise ValueError(f"Invalid init mode {mode!r}")

    diffusion_mod.weight_init = weight_init
    models_mod.diffusion = diffusion_mod
    modulus.models = models_mod
    return {"modulus": modulus, "modulus.models": models_mod,
            "modulus.models.diffusion": diffusion_mod}


def _make_nvtx_shim():
    nvtx = types.ModuleType("nvtx")

    def annotate(*a, **k):
        if len(a) == 1 and callable(a[0]) and not k:
            return a[0]
        return lambda fn: fn

    nvtx.annotate = annotate
    nvtx.push_range = lambda *a, **k: None
    nvtx.pop_range = lambda *a, **k: None
    return {"nvtx": nvtx}


def _load_by_path(path: str, modname: str, extra_sys_path=(), shims=None):
    """Import a reference source file under temporary shims/sys.path."""
    if modname in _cache:
        return _cache[modname]
    if not os.path.exists(path):
        return None
    shims = dict(shims or {})
    saved = {name: sys.modules.get(name) for name in shims}
    for name, mod in shims.items():
        sys.modules[name] = mod
    saved_path = list(sys.path)
    sys.path[:0] = list(extra_sys_path)
    try:
        spec = importlib.util.spec_from_file_location(modname, path)
        module = importlib.util.module_from_spec(spec)
        # sibling imports inside the reference file (e.g. `from layers
        # import ...`) must resolve against extra_sys_path, which is why
        # the model dir itself is prepended above
        sys.modules[modname] = module
        spec.loader.exec_module(module)
    finally:
        sys.path[:] = saved_path
        for name, prev in saved.items():
            if prev is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = prev
    _cache[modname] = module
    return module


def load_climsim_unet(version: str = "v5"):
    """Reference ClimsimUnet module (climsim_unet.py:35-411) under the
    mini-modulus/nvtx shims.  version in {"v4", "v5"} (the layers.py copies
    are identical; the model file differs only trivially)."""
    d = UNET_V5_DIR if version == "v5" else UNET_V4_DIR
    shims = {**_make_modulus_shim(), **_make_nvtx_shim()}
    # force a fresh `layers` import from this dir (identical copies exist
    # in each model dir; cache collisions across versions are harmless but
    # keep it explicit)
    layers = _load_by_path(os.path.join(d, "layers.py"),
                           f"_ref_layers_{version}", (d,), shims)
    if layers is None:
        return None
    shims = {**shims, "layers": layers}
    return _load_by_path(os.path.join(d, "climsim_unet.py"),
                         f"_ref_climsim_unet_{version}", (d,), shims)


def load_climsim_unet_classifier():
    """Reference classifier U-Net (climsim_unet_classifier.py:35-408) --
    the v5 two-stage scheme's gating network -- under the same shims as
    load_climsim_unet."""
    d = UNET_V5_DIR
    shims = {**_make_modulus_shim(), **_make_nvtx_shim()}
    layers = _load_by_path(os.path.join(d, "layers.py"),
                           "_ref_layers_v5", (d,), shims)
    if layers is None:
        return None
    shims = {**shims, "layers": layers}
    return _load_by_path(os.path.join(d, "climsim_unet_classifier.py"),
                         "_ref_climsim_unet_classifier", (d,), shims)


def load_loss_energy():
    """Reference loss_energy (Unet_v5/training/loss_energy.py:7-62)."""
    return _load_by_path(os.path.join(UNET_V5_DIR, "loss_energy.py"),
                         "_ref_loss_energy")


def load_mlp_v2rh():
    """Reference online MLP (MLP_v2rh/training/mlp.py:24-68)."""
    return _load_by_path(os.path.join(MLP_V2RH_DIR, "mlp.py"),
                         "_ref_mlp_v2rh", (MLP_V2RH_DIR,),
                         _make_modulus_shim())


def load_nn_wrapper(version: str = "v5"):
    """Reference coupling-wrapper class NewModel, extracted from the
    runnable cell of online_testing/model_postprocessing/
    {version}_nn_wrapper.ipynb (the cell defining the exact pre/forward/
    post pipeline E3SM consumes; README.md section 3.1).  version in
    {"v2", "v4", "v5"}.  Returns the class, or None without the tree."""
    if not reference_available():
        return None
    key = f"_nn_wrapper_{version}"
    if key in _cache:
        return _cache[key]
    import json

    import numpy as np
    import torch

    path = os.path.join(
        REFERENCE_ROOT, "online_testing/model_postprocessing",
        f"{version}_nn_wrapper.ipynb")
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        nb = json.load(f)
    src = next(("".join(c["source"]) for c in nb["cells"]
                if c["cell_type"] == "code"
                and "class NewModel" in "".join(c["source"])), None)
    if src is None:
        # notebook restructured upstream: follow the missing-file contract
        # (callers skip) instead of leaking StopIteration from a fixture
        return None
    ns = {"torch": torch, "nn": torch.nn, "np": np}
    exec(src, ns)  # plain torch; no reference-tree imports in the cell
    _cache[key] = ns["NewModel"]
    return ns["NewModel"]


def load_hsr():
    """Reference HSR (baseline_models/HSR/training/hsr.py:14-155)."""
    return _load_by_path(os.path.join(HSR_DIR, "hsr.py"), "_ref_hsr",
                         (HSR_DIR,))


def load_cvae():
    """Reference cVAE (baseline_models/cVAE/training/cvae.py:14-223)."""
    return _load_by_path(os.path.join(CVAE_DIR, "cvae.py"), "_ref_cvae",
                         (CVAE_DIR,))


# --------------------------------------------------------------------------
# Keras-side shims
# --------------------------------------------------------------------------

class FixedHp:
    """Stand-in for the keras_tuner `hp` object: every query returns its
    default (or an override from `fixed`)."""

    def __init__(self, fixed=None):
        self.fixed = dict(fixed or {})
        self.queried: dict = {}

    def _resolve(self, name, default, fallback):
        v = self.fixed.get(name, default if default is not None else fallback)
        self.queried[name] = v
        return v

    def Int(self, name, min_value=None, max_value=None, step=None,
            default=None, **k):
        return self._resolve(name, default, min_value)

    def Float(self, name, min_value=None, max_value=None, step=None,
              default=None, **k):
        return self._resolve(name, default, min_value)

    def Choice(self, name, values, default=None, **k):
        return self._resolve(name, default, values[0])

    def Boolean(self, name, default=False, **k):
        return self._resolve(name, default, False)


def _make_keras_tuner_shim():
    kt = types.ModuleType("keras_tuner")

    class HyperModel:
        def __init__(self, name=None, tunable=True):
            self.name = name
            self.tunable = tunable

        def _build_wrapper(self, hp, *a, **k):
            return self._build(hp, *a, **k)

        def build(self, hp):
            raise NotImplementedError

    class RandomSearch:  # constructor surface only; never .search()ed here
        def __init__(self, *a, **k):
            pass

    kt.HyperModel = HyperModel
    kt.RandomSearch = RandomSearch
    kt.HyperParameters = FixedHp
    return {"keras_tuner": kt}


def _make_tfa_shim():
    tfa = types.ModuleType("tensorflow_addons")
    optimizers = types.ModuleType("tensorflow_addons.optimizers")

    def CyclicalLearningRate(initial_learning_rate=1e-4, **k):
        # forward-parity shim: a plain float LR keeps keras.optimizers.*
        # happy; the real cyclic schedule is climsim_tpu.train.schedules
        return float(initial_learning_rate)

    optimizers.CyclicalLearningRate = CyclicalLearningRate

    def RectifiedAdam(learning_rate=1e-3, **k):
        import tensorflow as tf
        return tf.keras.optimizers.Adam(learning_rate=learning_rate)

    optimizers.RectifiedAdam = RectifiedAdam
    tfa.optimizers = optimizers
    return {"tensorflow_addons": tfa,
            "tensorflow_addons.optimizers": optimizers}


def _make_keras3_compat_shims():
    """Keras-3 aliases for Keras-2 module paths the reference imports."""
    import keras

    conv_mod = types.ModuleType("keras.layers.convolutional")
    conv_mod.Conv1D = keras.layers.Conv1D
    return {"keras.layers.convolutional": conv_mod}


def _xarray_stub():
    # the scripts import xarray at module level but build() never touches
    # it (the nc generator paths are not exercised by parity tests)
    if "xarray" in sys.modules:
        return {}
    return {"xarray": types.ModuleType("xarray")}


def load_keras_mlp_module():
    """Reference MLP HPO script (hpo_baseline_v1.py) -- exposes
    MyHyperModel whose .build(hp) constructs the trial Keras model."""
    shims = {**_make_keras_tuner_shim(), **_make_tfa_shim(),
             **_xarray_stub()}
    return _load_by_path(KERAS_MLP_PATH, "_ref_keras_mlp", (), shims)


def load_keras_cnn_module():
    """Reference CNN training script (hpo_train.py) -- exposes
    CNNHyperModel().build() plus the adjusted/CRPS losses."""
    shims = {**_make_keras_tuner_shim(), **_make_tfa_shim(),
             **_make_keras3_compat_shims(), **_xarray_stub()}
    return _load_by_path(KERAS_CNN_PATH, "_ref_keras_cnn", (), shims)


def build_keras_ed():
    """Execute the reference ED script's model-construction lines
    (ClimSIM_ED_1_3_train.py:31-88) and return the assembled `ED` model.

    The file is a straight-line training script (np.load of the real
    dataset at line 47, a 40-epoch .fit at line 133), so it cannot be
    imported whole; instead its source is executed verbatim UP TO the
    compile step, with np.load stubbed to tiny arrays.  No reference code
    is copied -- the literal reference lines build the model."""
    if "_ref_keras_ed_model" in _cache:
        return _cache["_ref_keras_ed_model"]
    if not os.path.exists(KERAS_ED_PATH):
        return None
    import numpy as np

    with open(KERAS_ED_PATH) as f:
        src = f.read()
    marker = "ED.compile("
    cut = src.find(marker)
    assert cut > 0, "ED script changed: compile marker not found"
    # split after the import block so Dense can be swapped for a Keras-2
    # compat wrapper: the script passes float units (intermediate_dim/2 =
    # 231.5, ClimSIM_ED_1_3_train.py:59-62) which tf.keras 2.x int-cast
    # (Dense.__init__: units = int(units)) and Keras 3 rejects.  The
    # wrapper restores the exact Keras-2 behavior the reference ran with.
    body_start = src.find("original_dim_input")
    assert 0 < body_start < cut, "ED script changed: body marker not found"
    header, body = src[:body_start], src[body_start:cut]

    class _NpShim:
        def __getattr__(self, name):
            if name == "load":
                return lambda *_a, **_k: np.zeros((4, 4), np.float32)
            return getattr(np, name)

    g = {"__name__": "_ref_keras_ed", "__file__": KERAS_ED_PATH}
    saved_np = sys.modules.get("numpy")
    # the script imports numpy itself; patching via exec globals is not
    # enough, so shadow the module for the duration of the exec
    shim_mod = types.ModuleType("numpy")
    shim = _NpShim()
    shim_mod.__getattr__ = lambda name: getattr(shim, name)
    sys.modules["numpy"] = shim_mod
    try:
        exec(compile(header, KERAS_ED_PATH, "exec"), g)
        real_dense = g["Dense"]
        g["Dense"] = lambda units, **k: real_dense(int(units), **k)
        exec(compile(body, KERAS_ED_PATH, "exec"), g)
    finally:
        if saved_np is None:
            sys.modules.pop("numpy", None)
        else:
            sys.modules["numpy"] = saved_np
    model = g["ED"]
    _cache["_ref_keras_ed_model"] = model
    return model
