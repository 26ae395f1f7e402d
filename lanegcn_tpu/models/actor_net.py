"""ActorNet: 1-D conv FPN over trajectory histories (reference lanegcn.py:212-263).

Three groups of two Res1d blocks (channels 32/64/128, stride-2 downsampling at
20→10→5 steps), 3-wide lateral convs to n_actor channels, linear top-down
upsampling with additive merge, a final Res1d, and the last timestep as the
actor embedding. Input is channels-last [A, T_hist, 3]; every row is an
independent actor, so packed padding rows are harmless.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from lanegcn_tpu.config import ModelConfig
from lanegcn_tpu.models.layers import Conv1dBlock, Res1d
from lanegcn_tpu.ops import interpolate_linear


class ActorNet(nn.Module):
    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, actor_feats: jax.Array) -> jax.Array:
        """actor_feats: [A, T_hist, 3] → [A, n_actor]."""
        n_out = (32, 64, self.cfg.n_actor)
        out = actor_feats

        outputs = []
        for i, ch in enumerate(n_out):
            stride = 1 if i == 0 else 2
            out = Res1d(ch, stride=stride, dtype=self.dtype, name=f"group{i}_block0")(out)
            out = Res1d(ch, dtype=self.dtype, name=f"group{i}_block1")(out)
            outputs.append(out)

        laterals = [
            Conv1dBlock(self.cfg.n_actor, act=False, dtype=self.dtype, name=f"lateral{i}")
            for i in range(len(n_out))
        ]
        out = laterals[-1](outputs[-1])
        for i in range(len(outputs) - 2, -1, -1):
            out = interpolate_linear(out, out.shape[1] * 2)
            out = out + laterals[i](outputs[i])

        out = Res1d(self.cfg.n_actor, dtype=self.dtype, name="output")(out)
        return out[:, -1, :]
