#!/usr/bin/env python
"""Extract data assets (grid + normalization statistics) into package .npz.

These are *dataset-derived statistics* published with the reference dataset
(grid_info/*.nc and preprocessing/normalizations/*.nc + lambda txt files),
converted once into flat per-varspec vectors so the framework is standalone
and free of netCDF at runtime.

Usage:  python scripts/extract_assets.py [--reference /root/reference]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from climsim_tpu.grid import Grid
from climsim_tpu.norms import NormStats
from climsim_tpu.utils.ncread import read_netcdf
from climsim_tpu.varspec import get_varspec

ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "climsim_tpu", "assets")


def nc_to_dict(path):
    nc = read_netcdf(path)
    return {k: np.asarray(v.data, dtype=np.float64)
            for k, v in nc.variables.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()
    ref = args.reference
    os.makedirs(ASSET_DIR, exist_ok=True)

    # --- grid ------------------------------------------------------------
    grid = Grid.from_netcdf(os.path.join(ref, "grid_info",
                                         "ClimSim_low-res_grid-info.nc"))
    grid.save_npz(os.path.join(ASSET_DIR, "grid_ne4.npz"))
    print(f"grid: ncol={grid.ncol} nlev={grid.num_levels}")

    norm_dir = os.path.join(ref, "preprocessing", "normalizations")

    def load_stats(mean_f, max_f, min_f):
        return (nc_to_dict(os.path.join(norm_dir, "inputs", mean_f)),
                nc_to_dict(os.path.join(norm_dir, "inputs", max_f)),
                nc_to_dict(os.path.join(norm_dir, "inputs", min_f)))

    base_mean, base_max, base_min = load_stats(
        "input_mean.nc", "input_max.nc", "input_min.nc")
    v4_mean, v4_max, v4_min = load_stats(
        "input_mean_v4_pervar.nc", "input_max_v4_pervar.nc",
        "input_min_v4_pervar.nc")
    v5_mean, v5_max, v5_min = load_stats(
        "input_mean_v5_pervar.nc", "input_max_v5_pervar.nc",
        "input_min_v5_pervar.nc")

    out_scale = nc_to_dict(os.path.join(norm_dir, "outputs", "output_scale.nc"))
    out_scale_v5 = nc_to_dict(os.path.join(
        norm_dir, "outputs", "output_scale_std_lowerthred_v5.nc"))
    out_scale_nop = nc_to_dict(os.path.join(
        norm_dir, "outputs", "output_scale_std_nopenalty.nc"))

    def load_lbd(fname):
        return np.loadtxt(os.path.join(norm_dir, "inputs", fname),
                          delimiter=",").reshape(-1)

    lbd_qn = load_lbd("qn_exp_lambda_large.txt")
    # separate-cloud rates for v4/v2-family specs (applied by the
    # reference's v4 datapip climsim_datapip.py:21-22 and the
    # v4/v2_nn_wrapper.ipynb preprocessing)
    lbd_qc = load_lbd("qc_exp_lambda_large.txt")
    lbd_qi = load_lbd("qi_exp_lambda_large.txt")

    # v1 / v2 use the NeurIPS'23 base stats + output_scale.nc
    for ver, (m, mx, mn, sc) in {
        "v1": (base_mean, base_max, base_min, out_scale),
        "v2": (base_mean, base_max, base_min, out_scale),
        # v2_rh and v4 use the per-variable expanded stats (contain state_rh,
        # *_dyn, *_prvphy); online configs pair them with std-based scales
        # (MLP_v2rh/training/conf/config_single.yaml:45-48).
        "v2_rh": (v4_mean, v4_max, v4_min, out_scale_nop),
        "v4": (v4_mean, v4_max, v4_min, out_scale_nop),
        "v5": (v5_mean, v5_max, v5_min, out_scale_v5),
    }.items():
        spec = get_varspec(ver)
        stats = NormStats.from_var_datasets(
            spec, m, mx, mn, sc,
            lbd_qn=lbd_qn if "state_qn" in spec.inputs else None)
        if "state_q0002" in spec.inputs:
            import dataclasses

            stats = dataclasses.replace(stats, lbd_qc=lbd_qc, lbd_qi=lbd_qi)
        path = os.path.join(ASSET_DIR, f"norms_{ver}.npz")
        stats.save_npz(path)
        print(f"norms_{ver}: in={stats.inp_sub.shape} out={stats.out_scale.shape}")


if __name__ == "__main__":
    main()
