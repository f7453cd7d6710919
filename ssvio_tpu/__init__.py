"""ssvio_tpu — a TPU-native stereo visual SLAM engine.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the
reference system weihaoysgs/ssvio (stereo ORB + pyramidal-LK tracking,
stereo triangulation, keyframe sliding-window local bundle adjustment,
BoW loop detection, pose-graph optimization) — re-designed SLAM-as-tensors:

- All per-frame state is fixed-shape, masked arrays so the hot path jits once.
- The front end (pyramids, FAST, BRIEF, LK) is data-parallel over pixels /
  keypoints and runs on the VPU; the optimizers (pose-only LM, Schur-reduced
  local BA, PGO) are batched Gauss-Newton/LM whose contractions hit the MXU.
- Scale-out shards landmark blocks over a `jax.sharding.Mesh` and combines
  Hessian contributions with `psum`/`reduce_scatter` over ICI collectives.

Conventions (used everywhere, documented once):
- Pose `T_cw`: maps world points into the camera frame; stored as a [3,4]
  float32 matrix `[R | t]`. Trajectories are exported as `T_wc` (camera in
  world), matching TUM format.
- se3 twists are ordered `[rho(3), phi(3)]` (translation, rotation), with
  LEFT-multiplicative updates: `T <- Exp(xi) @ T` (matches the reference's
  g2o vertex update semantics, reference include/ssvio/g2otypes.hpp:28-46).
- Images are float32 grayscale `[H, W]` in [0, 255]. Keypoints are `(x, y)`
  pixel coordinates, float32.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry/optimizer matmuls are tiny (3x3..96x96) but accuracy-critical:
# TPU f32 matmuls default to bf16 passes, which injects ~1e-3 relative error
# into pose chains and normal equations. Force true f32 everywhere; the hot
# front-end kernels are elementwise/gather so this costs nothing there, and
# any future bandwidth-bound matmul can opt down locally.
_jax.config.update("jax_default_matmul_precision", "highest")

from ssvio_tpu.config import Settings  # noqa: F401
