"""Digitize the reference's published error curve (4500/error.png).

The reference publishes NO numeric results — its entire accuracy evidence is
the four result figures at frame 4500 (README.md:43-46). For the
apples-to-apples drift comparison (VERDICT r5 item 1) this extracts the
xz-error-vs-time curve from /root/reference/4500/error.png:

  1. locate the axes box (the longest horizontal/vertical dark lines),
  2. collect the MATLAB-default-blue curve pixels inside it,
  3. map pixel coordinates onto the labeled ranges (x: 0-500 s, y: 0-45 m,
     read off the tick labels in the figure),
  4. median-aggregate per time bin -> eval/reference_error_curve.csv.

Usage: python tools/digitize_reference.py [--png /root/reference/4500/error.png]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Axis ranges as labeled in the figure (ticks 0..500 s / 0..45 m).
X_RANGE = (0.0, 500.0)
Y_RANGE = (0.0, 45.0)


def load_png(path: str) -> np.ndarray:
    import matplotlib.image as mpimg

    img = mpimg.imread(path)
    if img.dtype != np.float32 and img.dtype != np.float64:
        img = img.astype(np.float32) / 255.0
    return img[..., :3]


def find_axes_box(img: np.ndarray) -> tuple[int, int, int, int]:
    """(row_top, row_bottom, col_left, col_right) of the plot box."""
    dark = img.mean(axis=-1) < 0.55
    # Longest dark runs per row/column locate the box edges.
    row_counts = dark.sum(axis=1)
    col_counts = dark.sum(axis=0)
    H, W = dark.shape
    rows = np.flatnonzero(row_counts > 0.5 * W)
    cols = np.flatnonzero(col_counts > 0.5 * H)
    if rows.size < 2 or cols.size < 2:
        raise RuntimeError("axes box not found")
    return rows.min(), rows.max(), cols.min(), cols.max()


def curve_mask(img: np.ndarray) -> np.ndarray:
    """MATLAB default line color [0, 0.447, 0.741] — blue-dominant pixels."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return (b > 0.55) & (b - r > 0.2) & (g < b) & (g > 0.2)


def digitize(png: str, n_bins: int = 470) -> np.ndarray:
    img = load_png(png)
    r0, r1, c0, c1 = find_axes_box(img)
    m = curve_mask(img)
    m[: r0 + 1] = False
    m[r1:] = False
    m[:, : c0 + 1] = False
    m[:, c1:] = False
    ys, xs = np.nonzero(m)
    t = X_RANGE[0] + (xs - c0) / max(c1 - c0, 1) * (X_RANGE[1] - X_RANGE[0])
    e = Y_RANGE[1] - (ys - r0) / max(r1 - r0, 1) * (Y_RANGE[1] - Y_RANGE[0])
    # Median per time bin (the anti-aliased stroke is several px tall).
    order = np.argsort(t)
    t, e = t[order], e[order]
    edges = np.linspace(t.min(), t.max(), n_bins + 1)
    out = []
    for i in range(n_bins):
        sel = (t >= edges[i]) & (t < edges[i + 1])
        if sel.any():
            out.append((0.5 * (edges[i] + edges[i + 1]), float(np.median(e[sel]))))
    return np.asarray(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--png", default="/root/reference/4500/error.png")
    ap.add_argument("--out", default="REFERENCE_ERROR_CURVE.csv")
    args = ap.parse_args()
    curve = digitize(args.png)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        f.write("# digitized from %s (t[s], xz_error[m]); PlotOnMap.m:20 metric\n" % args.png)
        for t, e in curve:
            f.write(f"{t:.2f},{e:.3f}\n")
    print(
        f"{curve.shape[0]} samples  max {curve[:, 1].max():.1f} m  "
        f"mean {curve[:, 1].mean():.1f} m  -> {args.out}"
    )


if __name__ == "__main__":
    main()
