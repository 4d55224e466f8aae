"""Learned models: SuperPoint detector/descriptor and the multi-view GNN matcher.

Flax (linen) modules with static shapes throughout: SuperPoint always returns
exactly `max_keypoints` keypoints per image (invalid slots filled with random
positions and zero score -- the contract the reference's training path requires,
`/root/reference/train.py:340`, `/root/reference/helpers.py:91`).
"""

from e2e_multi_view_matching_tpu.models.superpoint import SuperPoint, SuperPointConfig
from e2e_multi_view_matching_tpu.models.matcher import MultiViewMatcher, MatcherConfig
