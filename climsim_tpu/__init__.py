"""climsim_tpu -- a TPU-native (JAX/XLA/Pallas/pjit) ClimSim engine.

Train and evaluate ML emulators of the E3SM-MMF cloud-resolving physics:
six offline baselines (MLP, CNN, ED, HSR, RPN, cVAE), three
coupling-grade online models (MLP_v2rh, U-Net v4/v5), a weighted metric
engine (MAE/RMSE/R2/bias/CRPS in W/m^2), and the online coupling surface
(wrapper + StableHLO export + rollout drivers + TCP sidecar).

Quick tour (docs/ has the full map):

    from climsim_tpu import get_varspec, load_default_grid
    from climsim_tpu.norms import load_asset_norms
    from climsim_tpu.train import recipes
    from climsim_tpu.train.loop import fit
    from climsim_tpu.eval.scoring import offline_score

CLI: ``python -m climsim_tpu.run --preset mlp_v1``.
"""

# Lazy top-level conveniences (PEP 562): keep `import climsim_tpu` free
# of jax/flax import cost until something is actually used.
_LAZY = {
    "get_varspec": ("climsim_tpu.varspec", "get_varspec"),
    "VarSpec": ("climsim_tpu.varspec", "VarSpec"),
    "load_default_grid": ("climsim_tpu.grid", "load_default_grid"),
    "Grid": ("climsim_tpu.grid", "Grid"),
    "load_asset_norms": ("climsim_tpu.norms", "load_asset_norms"),
    "NormStats": ("climsim_tpu.norms", "NormStats"),
    "ExperimentConfig": ("climsim_tpu.config", "ExperimentConfig"),
    "PRESETS": ("climsim_tpu.config", "PRESETS"),
}

__all__ = sorted(_LAZY)


def __getattr__(name):
    try:
        mod_name, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(
            f"module 'climsim_tpu' has no attribute {name!r}") from None
    import importlib

    return getattr(importlib.import_module(mod_name), attr)


def __dir__():
    return sorted(set(globals()) | set(_LAZY))
