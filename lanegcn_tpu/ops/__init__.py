"""Primitive TPU ops: masked scatter/gather, torch-semantics norm/conv/interp.

These are the building blocks that replace the reference's PyTorch CUDA
kernels (`index_add_`, cuDNN conv1d, GroupNorm — reference lanegcn.py:337,
layers.py:40-62) with XLA/Pallas-friendly equivalents.
"""

from lanegcn_tpu.ops.scatter import masked_gather, scatter_add, segment_softmax  # noqa: F401
from lanegcn_tpu.ops.table_gather import stacked_table_gather  # noqa: F401
from lanegcn_tpu.ops.norm import group_norm  # noqa: F401
from lanegcn_tpu.ops.conv import conv1d, interpolate_linear  # noqa: F401
