"""Differentiable pose optimization: two-view LM bundle adjustment (Schur form)."""

from e2e_multi_view_matching_tpu.pose.two_view_ba import bundle_adjust_two_view
