"""Shared utilities: config/flags, metric trackers, logging."""

from e2e_multi_view_matching_tpu.utils.config import (
    add_generic_arguments,
    apply_dataset_defaults,
    get_exp_dir,
)
from e2e_multi_view_matching_tpu.utils.trackers import MeanTracker, TimeTracker
