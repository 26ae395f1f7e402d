"""PredNet: multi-modal trajectory header (reference lanegcn.py:575-737).

Six independent LinearRes regression branches, destination attention for mode
scoring, and per-actor confidence-descending mode ordering. All actors of the
pack are processed densely; padding rows are masked downstream.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lanegcn_tpu.config import ModelConfig
from lanegcn_tpu.models.layers import Dense, Linear, LinearRes


class AttDest(nn.Module):
    """Destination attention (reference lanegcn.py:713-737)."""

    n_agt: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, agts: jax.Array, agt_ctrs: jax.Array, dest_ctrs: jax.Array) -> jax.Array:
        """agts [A, C], agt_ctrs [A, 2], dest_ctrs [A, K, 2] → [A*K, C]."""
        num_mods = dest_ctrs.shape[1]
        d = (agt_ctrs[:, None, :] - dest_ctrs).reshape(-1, 2)
        dist = Dense(self.n_agt, dtype=self.dtype, name="dist_dense")(d)
        dist = Linear(self.n_agt, dtype=self.dtype, name="dist_out")(nn.relu(dist))
        rep = jnp.repeat(agts, num_mods, axis=0)
        return Linear(self.n_agt, dtype=self.dtype, name="agt")(
            jnp.concatenate([dist, rep], axis=-1)
        )


class PredNet(nn.Module):
    """Multi-modal prediction head (reference lanegcn.py:575-631)."""

    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, actors: jax.Array, actor_ctrs: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """actors [A, C], actor_ctrs [A, 2] → (cls [A, K], reg [A, K, T, 2]).

        reg is in the agent frame (world transform applied by the Net);
        modes are sorted by descending confidence per actor.
        """
        k, t = self.cfg.num_mods, self.cfg.num_preds
        preds = []
        for i in range(k):
            h = LinearRes(self.cfg.n_actor, dtype=self.dtype, name=f"pred{i}_res")(actors)
            preds.append(Dense(2 * t, dtype=self.dtype, name=f"pred{i}_out")(h))
        reg = jnp.stack(preds, axis=1).reshape(actors.shape[0], k, t, 2)
        reg = reg + actor_ctrs[:, None, None, :]

        dest_ctrs = jax.lax.stop_gradient(reg[:, :, -1])
        feats = AttDest(self.cfg.n_actor, dtype=self.dtype, name="att_dest")(
            actors, actor_ctrs, dest_ctrs
        )
        h = LinearRes(self.cfg.n_actor, dtype=self.dtype, name="cls_res")(feats)
        cls = Dense(1, dtype=self.dtype, name="cls_out")(h).reshape(-1, k)

        # Per-actor confidence-descending mode order (reference lanegcn.py:618-622).
        order = jnp.argsort(-cls, axis=1)
        cls = jnp.take_along_axis(cls, order, axis=1)
        reg = jnp.take_along_axis(reg, order[:, :, None, None], axis=1)
        return cls, reg
