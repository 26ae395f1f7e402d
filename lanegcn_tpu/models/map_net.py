"""MapNet + the LaneConv stack (reference lanegcn.py:266-363, 410-480).

The LaneConv residual block computes, per node u:

    temp[u] = W_ctr x[u] + Σ_{r ∈ pre0..5, suc0..5, left, right}
                Σ_{(u,v) ∈ E_r} W_r x[v]
    x' = ReLU(GN(temp));  x'' = ReLU(Linear(x') + res)

The reference runs one `index_add_` CUDA scatter per relation per layer
(lanegcn.py:329-362). TPU-first formulation: all 14 relation transforms are a
single stacked [R, C, C] einsum (one big MXU matmul), then per-relation masked
gather + deterministic scatter-add over static-capacity edge lists.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from lanegcn_tpu.config import ModelConfig, band_shift, relation_names
from lanegcn_tpu.graph import EdgeSet, LaneGraphBatch
from lanegcn_tpu.models.layers import Dense, GroupNorm, Linear, torch_uniform_init
from lanegcn_tpu.ops import masked_gather, scatter_add


class LaneConvStack(nn.Module):
    """num_layers residual LaneConv blocks; shared by MapNet, M2M, and the
    LaneRCNN RoI/global-graph encoders (same 14-relation kernel)."""

    cfg: ModelConfig
    num_layers: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        feat: jax.Array,
        edges: Dict[str, EdgeSet],
        bands: Dict[str, jax.Array] | None = None,
    ) -> jax.Array:
        """bands: optional per-relation [N] bool masks of intra-lane edges
        (v = u + band_shift(nm)); applied as a masked roll — one vector op
        replacing the gather + scatter-add for the regular majority of
        pre/suc edges (see data/packing.py split_bands)."""
        n_map = self.cfg.n_map
        names = relation_names(self.cfg.num_scales)
        num_nodes = feat.shape[0]

        res = feat
        for i in range(self.num_layers):
            temp = Dense(n_map, use_bias=False, dtype=self.dtype, name=f"ctr_{i}")(feat)
            # One stacked weight for all relations: [R, C, C].
            w_rel = self.param(
                f"rel_kernel_{i}",
                torch_uniform_init(n_map),
                (len(names), n_map, n_map),
            )
            # Banded intra-lane pre/suc edges (v = u + 2^s in pack order):
            # one einsum contracting relation and channel over rolled, masked
            # copies of feat — temp[u] += Σ_r band_r[u]·(feat[u+d_r] @ W_r).
            # No [R, N, C] per-relation transform is ever materialized.
            if bands is not None:
                band_rel = [
                    (r, name, band_shift(name))
                    for r, name in enumerate(names)
                    if name in bands
                ]
                xs = jnp.stack(
                    [
                        jnp.where(
                            bands[name][:, None],
                            jnp.roll(feat, -shift, axis=0),
                            0,
                        )
                        for (_, name, shift) in band_rel
                    ],
                    0,
                )
                wb = w_rel[jnp.asarray([r for (r, _, _) in band_rel])]
                temp = temp + jnp.einsum(
                    "rnc,rcd->nd",
                    xs.astype(self.dtype),
                    wb.astype(self.dtype),
                    preferred_element_type=self.dtype,
                )
            # Irregular edges (left/right + cross-lane pre/suc residue):
            # gather source rows, per-relation matmul, deterministic
            # scatter-add — cost scales with edge-list capacity, not N.
            for r, name in enumerate(names):
                e = edges[name]
                src = masked_gather(feat, e.v, e.mask)
                msg = jnp.matmul(
                    src.astype(self.dtype),
                    w_rel[r].astype(self.dtype),
                    preferred_element_type=self.dtype,
                )
                temp = scatter_add(msg, e.u, num_nodes, mask=e.mask, out=temp)

            feat = nn.relu(GroupNorm(name=f"norm_{i}")(temp))
            feat = Linear(n_map, act=False, dtype=self.dtype, name=f"ctr2_{i}")(feat)
            feat = nn.relu(feat + res)
            res = feat
        return feat


class MapNet(nn.Module):
    """Lane-node embedding + LaneConv stack (reference lanegcn.py:266-363)."""

    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, graph: LaneGraphBatch) -> jax.Array:
        """graph → [N, n_map] node features."""
        n_map = self.cfg.n_map
        # input MLP on node centers; seg MLP on segment direction vectors.
        ctr_emb = Dense(n_map, dtype=self.dtype, name="input_dense")(graph.ctrs)
        ctr_emb = Linear(n_map, act=False, dtype=self.dtype, name="input_out")(nn.relu(ctr_emb))
        seg_emb = Dense(n_map, dtype=self.dtype, name="seg_dense")(graph.feats)
        seg_emb = Linear(n_map, act=False, dtype=self.dtype, name="seg_out")(nn.relu(seg_emb))
        feat = nn.relu(ctr_emb + seg_emb)

        return LaneConvStack(
            self.cfg, self.cfg.num_fuse_layers, dtype=self.dtype, name="fuse"
        )(feat, graph.edges, graph.bands)
