"""vo_tpu — TPU-native stereo visual-odometry / SLAM engine in JAX.

A ground-up re-design of the pipeline in ivario123/r7020e-visual-odometry
(MATLAB, see /root/reference: VO.m) for TPU hardware:

- SIFT-style scale-space detection + 128-D descriptors as batched XLA/Pallas
  programs with static shapes (replaces detectSIFTFeatures/extractFeatures,
  VO.m:79-84).
- Descriptor matching as tiled distance-matrix matmuls + top-2 + Lowe ratio
  (replaces the 5 matchFeatures calls, VO.m:87,283,293,311,323).
- Batched DLT triangulation (replaces the scalar loop VO.m:113-116).
- Vectorized RANSAC-P3P pose estimation (replaces estworldpose, VO.m:123-127).
- Frame-to-frame pose chaining + global landmark map (VO.m:130-160).
- Sliding-window bundle adjustment, pose-graph optimization, and multi-chip
  sharding (no reference counterpart; north-star extensions).

Subpackages:
  geom      SE(3), camera models, triangulation
  io        KITTI parsers, synthetic data, native data loader bindings
  frontend  scale-space feature detection, descriptors, matching, tracking
  pose      P3P, RANSAC, nonlinear refinement
  odometry  per-frame VO pipeline + landmark store + host runner
  ba        sliding-window bundle adjustment (Schur complement) + pose graph
  dist      device-mesh parallel components (sharded RANSAC / BA)
  eval      trajectory metrics (xz-error, ATE, RPE)
  viz       the four reference figures, matplotlib backend
  utils     padding/masking, checkpointing, profiling
"""

__version__ = "0.1.0"
