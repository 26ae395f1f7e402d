"""lanegcn_tpu — a TPU-native lane-graph motion-forecasting framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the LaneGCN
reference (leepaul009/LaneGCN-1): ActorNet 1-D conv FPN, multi-scale dilated
LaneConv message passing (MapNet / M2M), sparse distance-gated attention fusion
(A2M / M2A / A2A), and the multi-modal PredNet trajectory head, trained
end-to-end on Argoverse-style lane graphs.

Design stance (vs. the reference's dynamic list-of-tensors batching):
every batch is packed into static-shape, mask-carrying pytrees
(`lanegcn_tpu.graph.PackedBatch`) so that the whole training step jit-compiles
once per bucket; all scatter/gather message passing is expressed as dense
matmuls + masked segment-sums that XLA/Pallas map onto the MXU.
"""

__version__ = "0.1.0"

from lanegcn_tpu import config as config  # noqa: F401
