"""Mesh-sharded execution: data-parallel training over ICI/DCN.

Replaces the reference's Horovod/NCCL allreduce + mpi4py metric allgather
(reference train.py:66-69,145-146,245-255) with SPMD sharding: the batch's
leading pack axis is sharded over the mesh's `data` axis, params are
replicated, and XLA inserts the gradient psum during jit partitioning —
no explicit collectives or broadcasts in user code.
"""

from lanegcn_tpu.parallel.graph_parallel import (  # noqa: F401
    make_explicit_parallel_roi_train_step,
    make_explicit_parallel_train_step,
    partition_pack_edges,
    partition_roi_pack_edges,
    partition_stacked_edges,
    sharded_edge_specs,
    stack_pack_edges,
)
from lanegcn_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    graph_batch_shardings,
    make_mesh,
    make_mesh_2d,
    make_parallel_train_step,
    replicate_sharding,
    stack_packs,
)
