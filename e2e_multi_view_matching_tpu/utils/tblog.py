"""TensorBoard logging + profiler hooks (SURVEY.md section 5 aux subsystems).

Mirrors the reference's rank-0 SummaryWriter under `<ckpt_dir>/runs/<exp>`
(`/root/reference/helpers.py:276-282`) with train/val scalars
(`train.py:442-451,112-121`), and adds what the reference lacks: optional
`jax.profiler` trace capture over a step window for TPU performance analysis.
"""

import os


class TBWriter:
    """Lazy TensorBoard writer; no-ops when disabled or unavailable."""

    def __init__(self, checkpoint_dir, exp_name, enabled=True):
        self._writer = None
        self._enabled = enabled
        self._run_dir = os.path.join(checkpoint_dir, "runs", exp_name)

    def _get(self):
        if not self._enabled:
            return None
        if self._writer is None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._writer = SummaryWriter(log_dir=self._run_dir)
            except Exception:
                self._enabled = False
        return self._writer

    def scalars(self, tag, values, step):
        w = self._get()
        if w is not None:
            w.add_scalars(tag, values, step)

    def flush(self):
        if self._writer is not None:
            self._writer.flush()


class StepProfiler:
    """Capture a `jax.profiler` trace over a window of training steps."""

    def __init__(self, trace_dir, start_step, end_step):
        self.trace_dir = trace_dir
        self.start_step = start_step
        self.end_step = end_step
        self._active = False

    def maybe_start(self, step):
        if not self._active and self.start_step is not None and step == self.start_step:
            import jax

            os.makedirs(self.trace_dir, exist_ok=True)
            jax.profiler.start_trace(self.trace_dir)
            self._active = True

    def maybe_stop(self, step):
        if self._active and step >= self.end_step:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            return True
        return False
