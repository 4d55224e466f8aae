"""Multi-view pose optimization engine.

In-process JAX replacement of the reference's C++ subprocess stack
(`/root/reference/pose_optimization/multi_view/bundle_adjustment/`):

- `rotation_averaging`: robust IRLS rotation averaging (the role of Theia's
  `RobustRotationEstimator`, Chatterjee-Govindu).
- `translation_averaging`: least-unsquared-deviations position estimation (the
  role of Theia's `LeastUnsquaredDeviationPositionEstimator`, Ozyesil-Singer).
- `bundle_adjust`: confidence-weighted multi-camera Schur-complement LM BA (the
  role of the Ceres DENSE_SCHUR `bundle_adjuster`).
- `spanning_tree`: maximum-spanning-tree absolute pose chaining (host-side,
  mirrors `bundle_adjust_io.py:135-172`).
- `pipeline`: the `eval_bundle_adjust` orchestration without any process
  boundary or CSV IPC (`/root/reference/eval_multi_view.py:21-68`).
"""

from e2e_multi_view_matching_tpu.mvba.rotation_averaging import rotation_averaging
from e2e_multi_view_matching_tpu.mvba.translation_averaging import translation_averaging
from e2e_multi_view_matching_tpu.mvba.bundle_adjust import bundle_adjust_multi_view
from e2e_multi_view_matching_tpu.mvba.spanning_tree import spanning_tree_poses
from e2e_multi_view_matching_tpu.mvba.pipeline import robust_relative_poses
