"""Model registry — the pluggable-model public interface.

The reference's contract is `import_module(name).get_model()` returning a
7-tuple (reference train.py:63-64). Here the same pluggability is a registry
of factories returning a ModelBundle: config + net + loss/metric functions.
Any module may register additional models (LaneRCNN registers itself in
lanegcn_tpu.models.lanercnn).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

from lanegcn_tpu.config import Config


@dataclasses.dataclass
class ModelBundle:
    name: str
    config: Config
    net: Any  # flax module taking a PackedBatch
    loss_fn: Callable  # (out, batch, loss_cfg) → dict with "loss" + sums
    metrics_fn: Callable  # (out, batch) → metric sums


_REGISTRY: Dict[str, Callable[[Config], ModelBundle]] = {}


def register(name: str):
    def deco(factory: Callable[[Config], ModelBundle]):
        _REGISTRY[name] = factory
        return factory

    return deco


def get_model(name: str, config: Config | None = None) -> ModelBundle:
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](config or Config())


def available() -> list:
    return sorted(_REGISTRY)


@register("lanegcn")
def _lanegcn(config: Config) -> ModelBundle:
    from lanegcn_tpu.models.lanegcn import LaneGCN, agent_metrics, pred_loss

    return ModelBundle(
        name="lanegcn",
        config=config,
        net=LaneGCN(config.model),
        loss_fn=pred_loss,
        metrics_fn=agent_metrics,
    )
