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
    net: Any  # flax module taking a packed batch
    loss_fn: Callable  # (out, batch, loss_cfg) → dict with "loss" + sums
    metrics_fn: Callable  # (out, batch) → metric sums
    # (out, batch) → (preds [n, K, T, 2], gts [n, T, 2], probs [n, K]) numpy,
    # for eval / submission. probs = softmax of per-mode confidences.
    extract_fn: Callable = None


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


def _softmax(x):
    import numpy as np

    z = np.exp(x - x.max(axis=-1, keepdims=True))
    return z / z.sum(axis=-1, keepdims=True)


def _extract_lanegcn(out, batch):
    import numpy as np

    mask = np.asarray(batch.scen_mask)
    idx = np.asarray(batch.agent_idx)[mask]
    probs = _softmax(np.asarray(out["cls"])[idx])
    return np.asarray(out["reg"])[idx], np.asarray(batch.gt_preds)[idx], probs


def _extract_lanercnn(out, batch):
    import numpy as np

    mask = np.asarray(batch.scen_mask)
    probs = _softmax(np.asarray(out["pred_logics"])[mask])
    return np.asarray(out["pred_trajs"])[mask], np.asarray(batch.gt_preds)[mask], probs


@register("lanegcn")
def _lanegcn(config: Config) -> ModelBundle:
    from lanegcn_tpu.models.lanegcn import LaneGCN, agent_metrics, pred_loss

    return ModelBundle(
        name="lanegcn",
        config=config,
        net=LaneGCN(config.model),
        loss_fn=pred_loss,
        metrics_fn=agent_metrics,
        extract_fn=_extract_lanegcn,
    )


@register("lanercnn")
def _lanercnn(config: Config) -> ModelBundle:
    """LaneRCNN trains with AdamW + weight decay 0.01 (reference
    lanercnn.py:37,42) and consumes RoiPackedBatch inputs."""
    import dataclasses

    from lanegcn_tpu.models.lanercnn import LaneRCNN, roi_loss, roi_metrics

    if config.train.opt == "adam" and config.train.weight_decay == 0.0:
        config = dataclasses.replace(
            config, train=dataclasses.replace(config.train, opt="adamw", weight_decay=0.01)
        )
    return ModelBundle(
        name="lanercnn",
        config=config,
        net=LaneRCNN(config.model),
        loss_fn=roi_loss,
        metrics_fn=roi_metrics,
        extract_fn=_extract_lanercnn,
    )
