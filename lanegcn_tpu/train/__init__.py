"""Training runtime: optimizer, train step, loop, checkpointing, metrics."""

from lanegcn_tpu.train.optimizer import make_optimizer, step_lr  # noqa: F401
