"""TPU compute primitives: attention over view/keypoint tokens, log-domain Sinkhorn.

These are the two hot non-conv kernels of the matcher (SURVEY.md section 3.1).
Pure-XLA reference implementations live here; Pallas-fused variants are provided
where profiling justifies them and are selected via the `impl` arguments.
"""

from e2e_multi_view_matching_tpu.ops.attention import multi_head_attention
from e2e_multi_view_matching_tpu.ops.sinkhorn import log_optimal_transport, log_sinkhorn
