"""Synthetic stereo-sequence generation for tests and benchmarks.

The reference repo ships calibration, times, and ground-truth poses for KITTI
odometry sequences 00-10 but git-ignores the images (reference .gitignore:1-2)
— the user is expected to download them. To keep this framework's tests and
benchmarks hermetic, this module renders synthetic stereo frames that are
*geometrically faithful* to KITTI: real calibration (kitti/00/calib.txt), real
GT trajectories (kitti/poses/00.txt), and a random textured 3D landmark field,
rasterized through the actual projection model.

Two levels:
- ``make_tracks`` — no images; exact 2D/3D correspondences (+ noise/outliers)
  for unit-testing triangulation, RANSAC-P3P, BA.
- ``SyntheticSequence`` — rendered grayscale stereo pairs driving the full
  detect→describe→match→pose pipeline end-to-end.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..geom.camera import StereoCalib


def _c2w_apply(T: np.ndarray, pts: np.ndarray) -> np.ndarray:
    return pts @ T[:3, :3].T + T[:3, 3]


def _w2c_apply(T: np.ndarray, pts: np.ndarray) -> np.ndarray:
    R = T[:3, :3]
    return (pts - T[:3, 3]) @ R


def scatter_landmarks(
    rng: np.random.Generator,
    gt_poses: np.ndarray,
    n_landmarks: int,
    depth_range=(5.0, 60.0),
    lateral_range=(-25.0, 25.0),
    height_range=(-4.0, 3.0),
) -> np.ndarray:
    """Strew [N, 3] world-frame landmarks along the GT trajectory.

    Each landmark is anchored to a random pose and offset in that camera's
    frame so every frame sees a healthy population.
    """
    idx = rng.integers(0, gt_poses.shape[0], size=n_landmarks)
    z = rng.uniform(*depth_range, size=n_landmarks)
    x = rng.uniform(*lateral_range, size=n_landmarks)
    y = rng.uniform(*height_range, size=n_landmarks)
    cam_pts = np.stack([x, y, z], axis=-1)
    out = np.empty((n_landmarks, 3), dtype=np.float64)
    for i in range(n_landmarks):
        out[i] = _c2w_apply(gt_poses[idx[i]], cam_pts[i])
    return out


class Tracks(NamedTuple):
    """Exact correspondences for one frame pair (no images)."""

    px_prev_l: np.ndarray  # [N, 2] left pixels, frame i-1
    px_prev_r: np.ndarray  # [N, 2] right pixels, frame i-1
    px_cur_l: np.ndarray  # [N, 2] left pixels, frame i
    px_cur_r: np.ndarray  # [N, 2] right pixels, frame i
    pts_prev_cam: np.ndarray  # [N, 3] 3D in frame i-1 camera coords
    pts_cur_cam: np.ndarray  # [N, 3] 3D in frame i camera coords
    rel_pose: np.ndarray  # [4, 4] camera-i pose in frame i-1 coords (the estworldpose target)


def project_np(P: np.ndarray, pts_cam: np.ndarray) -> np.ndarray:
    Xh = np.concatenate([pts_cam, np.ones_like(pts_cam[:, :1])], axis=-1)
    uvw = Xh @ P.T
    return uvw[:, :2] / uvw[:, 2:3]


def make_tracks(
    rng: np.random.Generator,
    calib: StereoCalib,
    pose_prev_c2w: np.ndarray,
    pose_cur_c2w: np.ndarray,
    landmarks_world: np.ndarray,
    noise_px: float = 0.0,
    outlier_frac: float = 0.0,
    max_points: int | None = None,
) -> Tracks:
    """Correspondences between two stereo frames for landmarks visible in all 4 views."""
    H, W = calib.image_size
    P1 = np.asarray(calib.P1, dtype=np.float64)
    P2 = np.asarray(calib.P2, dtype=np.float64)

    prev_cam = _w2c_apply(pose_prev_c2w, landmarks_world)
    cur_cam = _w2c_apply(pose_cur_c2w, landmarks_world)
    pxs = [project_np(P, pts) for P, pts in ((P1, prev_cam), (P2, prev_cam), (P1, cur_cam), (P2, cur_cam))]
    vis = (prev_cam[:, 2] > 1.0) & (cur_cam[:, 2] > 1.0)
    for px in pxs:
        vis &= (px[:, 0] >= 0) & (px[:, 0] < W) & (px[:, 1] >= 0) & (px[:, 1] < H)
    keep = np.flatnonzero(vis)
    if max_points is not None and keep.size > max_points:
        keep = rng.choice(keep, size=max_points, replace=False)
    pxs = [px[keep] for px in pxs]
    prev_cam, cur_cam = prev_cam[keep], cur_cam[keep]

    if noise_px > 0:
        pxs = [px + rng.normal(scale=noise_px, size=px.shape) for px in pxs]
    n = keep.size
    if outlier_frac > 0 and n > 0:
        n_out = int(outlier_frac * n)
        out_idx = rng.choice(n, size=n_out, replace=False)
        # Corrupt the current-left observation (the one RANSAC scores against).
        pxs[2][out_idx] = np.stack(
            [rng.uniform(0, W, n_out), rng.uniform(0, H, n_out)], axis=-1
        )

    rel = np.linalg.inv(pose_prev_c2w) @ pose_cur_c2w
    return Tracks(
        px_prev_l=pxs[0],
        px_prev_r=pxs[1],
        px_cur_l=pxs[2],
        px_cur_r=pxs[3],
        pts_prev_cam=prev_cam,
        pts_cur_cam=cur_cam,
        rel_pose=rel,
    )


class SyntheticSequence:
    """Rendered stereo feed: textured landmark splats through real KITTI geometry.

    Matches the surface of io.kitti.StereoSequence (frame(i) -> (left, right)
    float32 [H, W] in [0,1]) so the VO runner is agnostic to real vs synthetic.

    Splats are ANALYTIC GAUSSIAN MIXTURES with a DOMINANT CENTER BLOB,
    rendered at fixed pixel scale (``perspective_splats=False``, default).
    The design is the result of measured failure analysis:

    - A uniformly random fixed-size texture stamp (no dominant center) puts
      the DoG extremum at a ~1 px random offset d from the true projection.
      d is constant in PIXELS, so the tracked point is a different 3D point
      at every depth (lateral error d*z/f): invisible frame-to-frame
      (~0.07 px) but systematic across a BA window where depth changes 2-3x
      (~1 px reprojection inconsistency) — measured to make every window-BA
      solve reduce cost while degrading pose accuracy.
    - Perspective-scaled splats remove that bias in principle, but destroy
      matching in practice: under minification the texture aliases (point
      sampling) or washes out (bandlimited), scale-varying appearance
      spreads detections across octaves, and overlapping splats at
      different depths mix view-dependently. An OpenCV SIFT control matched
      as badly as this engine's frontend on such frames (median ~30 deg
      orientation disagreement between true stereo partners), confirming
      the scene, not the detector, was at fault.

    The fix: keep fixed-size splats (identical appearance in every view =>
    maximal descriptor consistency) and pin the extremum to the projection
    center with a dominant center Gaussian; weaker random side bumps give
    orientation stability and descriptor distinctiveness while perturbing
    the extremum only ~0.1-0.2 px — pushing the depth-coupled bias below
    detection noise. Mixtures are evaluated analytically (separable
    closed-form Gaussians), so there is no stamp-phase resampling blur.
    """

    def __init__(
        self,
        calib: StereoCalib,
        gt_poses: np.ndarray,
        times: np.ndarray | None = None,
        n_landmarks: int = 4000,
        patch: int = 9,
        seed: int = 0,
        image_size: tuple | None = None,
        perspective_splats: bool = False,
        noise: float = 0.0,
        z_far: float = 100.0,
    ):
        if image_size is not None and tuple(image_size) != tuple(calib.image_size):
            # Keep the field of view sensible at reduced test resolutions:
            # rescale intrinsics instead of cropping to the top-left corner.
            from ..geom.camera import scale_calib

            calib = scale_calib(calib, image_size)
        self.calib = calib
        self.gt_poses = gt_poses
        self.times = times
        self.H, self.W = calib.image_size
        # Host copies of the projection matrices, fetched ONCE: calib fields
        # are jnp arrays, and an np.asarray(P) inside frame() would cost a
        # device->host round trip per rendered image (minutes of pure tunnel
        # latency when preloading a long sequence on the remote TPU).
        self._P1 = np.asarray(calib.P1, dtype=np.float64)
        self._P2 = np.asarray(calib.P2, dtype=np.float64)
        rng = np.random.default_rng(seed)
        self.landmarks = scatter_landmarks(rng, gt_poses, n_landmarks)
        self.patch = patch
        self.perspective_splats = perspective_splats
        # Additive Gaussian sensor noise (stddev in [0,1] intensity units),
        # deterministic per (seed, frame, camera). The noiseless feed leaves
        # frame-to-frame VO near its floor, which understates the value of
        # BA/loop closure; realistic sensor noise restores an honest drift
        # regime for the long-run artifacts.
        self.noise = float(noise)
        self._seed = seed
        # Visibility horizon. Without it, every landmark anchored anywhere
        # down a long straight street (or a parallel block — there is no
        # building occlusion in this scene model) projects in-frustum and
        # the painter loop renders thousands of splats per frame: measured
        # 3.6-25 s/frame on the full 4,541-pose KITTI 00 trajectory at 30
        # landmarks/pose vs ~0.5 s with the horizon. A 100 m horizon also
        # better matches real KITTI imagery (urban sight lines are
        # building-limited) and comfortably exceeds the reference's 80 m
        # landmark depth gate (CreateLandmarksFromFeatures.m:13).
        self.z_far = float(z_far)
        # Perspective mode only: depth at which a splat spans ``patch`` px.
        self.z_ref = 20.0
        self.sigma_aa = 0.6  # anti-alias filter stddev, output px
        # Per-landmark Gaussian-mixture fingerprint, in TEXEL units:
        #   bump 0 — dominant center blob: pins the DoG extremum to the
        #            projection center (the bias fix, see class docstring);
        #            its randomized scale is a coarse per-landmark signature;
        #   bumps 1+ — moderate random side bumps: orientation stability +
        #            descriptor distinctiveness; their amplitude is kept
        #            below the center blob so the extremum shift stays
        #            ~0.1-0.2 px.
        K = 10
        half = patch * 0.5 - 1.0
        cy = rng.uniform(-half, half, size=(n_landmarks, K)).astype(np.float32)
        cx = rng.uniform(-half, half, size=(n_landmarks, K)).astype(np.float32)
        cy[:, 0] = 0.0
        cx[:, 0] = 0.0
        sig = rng.uniform(0.8, 1.6, size=(n_landmarks, K)).astype(np.float32)
        sig[:, 0] = rng.uniform(2.0, 3.0, size=n_landmarks)
        amp = (
            rng.uniform(0.22, 0.4, size=(n_landmarks, K))
            * rng.choice([-1.0, 1.0], size=(n_landmarks, K))
        ).astype(np.float32)
        amp[:, 0] = 0.62 * np.sign(amp[:, 0])
        self._bump_cy, self._bump_cx = cy, cx
        self._bump_sig, self._bump_amp = sig, amp

    def __len__(self) -> int:
        return self.gt_poses.shape[0]

    def _render(self, pts_cam: np.ndarray, P: np.ndarray) -> np.ndarray:
        H, W, p = self.H, self.W, self.patch
        pad = 40  # must exceed the largest half-splat (scale clamp below)
        img = np.full((H + 2 * pad, W + 2 * pad), 0.35, dtype=np.float32)
        vis = (pts_cam[:, 2] > 1.0) & (pts_cam[:, 2] < self.z_far)
        px = project_np(P, np.where(vis[:, None], pts_cam, np.array([0.0, 0.0, 10.0])))
        inb = vis & (px[:, 0] >= 1) & (px[:, 0] < W - 1) & (px[:, 1] >= 1) & (px[:, 1] < H - 1)
        s2aa = self.sigma_aa**2
        # Painter's algorithm: far-to-near so near splats occlude far ones.
        order = np.flatnonzero(inb)[np.argsort(-pts_cam[inb, 2])]
        for i in order:
            u, v = px[i]
            # Fixed pixel scale by default (see class docstring); optional
            # perspective magnification, clamped to the padding.
            s = (
                min(self.z_ref / float(pts_cam[i, 2]), (pad - 4.0) / p)
                if self.perspective_splats
                else 1.0
            )
            # Bump geometry in image px; the AA filter is folded into each
            # variance, amplitudes scaled as a true Gaussian prefilter.
            oy = self._bump_cy[i] * s
            ox = self._bump_cx[i] * s
            var = (self._bump_sig[i] * s) ** 2 + s2aa  # [K]
            amp = self._bump_amp[i] * (self._bump_sig[i] * s) ** 2 / var
            h = float(s * (0.5 * p) + 3.0 * np.sqrt(var.max()))
            r0, r1 = int(np.ceil(v - h)), int(np.floor(v + h))
            c0, c1 = int(np.ceil(u - h)), int(np.floor(u + h))
            r0, r1 = max(r0, -pad), min(r1, H + pad - 1)
            c0, c1 = max(c0, -pad), min(c1, W + pad - 1)
            ry = np.arange(r0, r1 + 1) - v
            rx = np.arange(c0, c1 + 1) - u
            dy = ry[:, None] - oy[None, :]  # [By, K]
            dx = rx[:, None] - ox[None, :]  # [Bx, K]
            inv2v = 0.5 / var
            gy = np.exp(-dy * dy * inv2v) * amp  # amplitude folded into y factor
            gx = np.exp(-dx * dx * inv2v)
            vals = gy @ gx.T  # separable isotropic mixture: [By, Bx]
            # Opaque composite (far-to-near): the splat REPLACES what is
            # behind it under a wide Gaussian alpha. Additive blending mixes
            # the tails of neighbors at other depths into the local patch;
            # those neighbors shift differently between views, wandering the
            # DoG extremum view-dependently (~0.5 px RMS residual measured
            # at GT poses). Occlusion keeps each center single-layer.
            a_var = (0.55 * p * s) ** 2 + s2aa
            ay = np.exp(ry * ry * (-0.5 / a_var))
            ax = np.exp(rx * rx * (-0.5 / a_var))
            alpha = 0.98 * ay[:, None] * ax[None, :]
            box = img[r0 + pad : r1 + 1 + pad, c0 + pad : c1 + 1 + pad]
            box *= 1.0 - alpha
            box += alpha * (0.42 + vals)
        return np.clip(img[pad : pad + H, pad : pad + W], 0.0, 1.0)

    def frame(self, i: int):
        pose = self.gt_poses[i]
        pts_cam = _w2c_apply(pose, self.landmarks)
        left = self._render(pts_cam, self._P1)
        right = self._render(pts_cam, self._P2)
        if self.noise > 0.0:
            rl = np.random.default_rng((self._seed, i, 0))
            rr = np.random.default_rng((self._seed, i, 1))
            left = np.clip(left + rl.normal(0.0, self.noise, left.shape).astype(np.float32), 0.0, 1.0)
            right = np.clip(right + rr.normal(0.0, self.noise, right.shape).astype(np.float32), 0.0, 1.0)
        return left, right

    def __iter__(self):
        for i in range(len(self)):
            yield self.frame(i)


def kitti_synthetic_sequence(
    reference_root: str = "/root/reference",
    seq: str = "00",
    n_frames: int = 50,
    n_landmarks: int = 4000,
    seed: int = 0,
    image_size: tuple | None = None,
):
    """Convenience: synthetic feed using the real KITTI calib + GT poses shipped in the reference."""
    import os

    from . import kitti

    seq_dir = os.path.join(reference_root, "kitti", seq)
    calib = kitti.load_stereo_calib(seq_dir)
    poses = kitti.read_poses(os.path.join(reference_root, "kitti", "poses", f"{seq}.txt"))[:n_frames]
    times_path = os.path.join(seq_dir, "times.txt")
    times = kitti.read_times(times_path)[:n_frames] if os.path.exists(times_path) else None
    return SyntheticSequence(
        calib, poses, times=times, n_landmarks=n_landmarks, seed=seed, image_size=image_size
    )
