"""Model zoo: LaneGCN (flagship) and LaneRCNN (variant), on a shared op stack."""

from lanegcn_tpu.models.layers import Linear, LinearRes, Conv1dBlock, Res1d  # noqa: F401
