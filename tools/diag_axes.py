"""Per-axis error decomposition of saved bigrun trajectories (VERDICT r5 item 5).

r4 observed that window BA halves 3D ATE while WORSENING the reference's
planar xz metric vs plain loop closure (BIGRUN_r04: vo_ba_lc xz mean 0.198
vs vo_lc 0.126 m). The reference's metric ignores the y (height) axis
(PlotOnMap.m:20 uses columns 4 and 12 of the GT rows — x and z only), so a
refinement that trades planar accuracy for height accuracy shows up as an
ATE win and an xz loss simultaneously. This decomposes the saved
trajectories (tools/bigrun.py --save-traj -> figs/traj_<config>.npz) into
per-axis error series to make that trade measurable.

Usage: python tools/diag_axes.py [--fig-dir figs]
"""
from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def decompose(poses: np.ndarray, gt: np.ndarray) -> dict:
    # Row i of the estimate corresponds to GT row i (the reference's
    # off-by-one convention is already applied upstream in eval.metrics).
    n = min(poses.shape[0], gt.shape[0])
    e = poses[:n, :3, 3] - gt[:n, :3, 3]
    ax = {}
    for k, name in enumerate("xyz"):
        ax[f"{name}_mean_abs_m"] = round(float(np.abs(e[:, k]).mean()), 4)
        ax[f"{name}_max_abs_m"] = round(float(np.abs(e[:, k]).max()), 4)
    xz = np.hypot(e[:, 0], e[:, 2])
    ax["xz_mean_m"] = round(float(xz.mean()), 4)
    ax["ate_rmse_m"] = round(float(np.sqrt((e**2).sum(-1).mean())), 4)
    return ax


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fig-dir", default="figs")
    args = ap.parse_args()
    out = {}
    for path in sorted(glob.glob(os.path.join(args.fig_dir, "traj_*.npz"))):
        name = os.path.basename(path)[len("traj_") : -len(".npz")]
        z = np.load(path)
        out[name] = decompose(z["poses"], z["gt"][1 : 1 + z["poses"].shape[0]])
        print(name, json.dumps(out[name]))


if __name__ == "__main__":
    main()
