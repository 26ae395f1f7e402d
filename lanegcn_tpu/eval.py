"""Argoverse-style forecasting metrics + full val-inference path.

Equivalent of the reference's test.py:101-109 eval flow, which calls
`argoverse.evaluation.eval_forecasting.compute_forecasting_metrics` for K=6
and K=1: per sequence, minADE = min over modes of mean displacement, minFDE =
min over modes of final displacement, MR = fraction of sequences whose
min-FDE mode misses the endpoint by > threshold.

Note the reference's *training-log* metrics (pred_metrics lanegcn.py:883-899)
differ slightly: there `ade` is the ADE of the min-FDE mode. Both are
provided (`log_style=True` reproduces the training-log variant).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def forecasting_metrics(
    preds: np.ndarray,  # [B, K, T, 2]
    gts: np.ndarray,  # [B, T, 2]
    k: int = 6,
    miss_threshold: float = 2.0,
    log_style: bool = False,
) -> Dict[str, float]:
    """Official-semantics minADE/minFDE/MR over the top-k modes.

    Modes are assumed confidence-descending (PredNet sorts them), so top-k
    slicing matches the reference's K=1 evaluation of the best-scored mode.
    """
    preds = np.asarray(preds, np.float64)[:, :k]
    gts = np.asarray(gts, np.float64)
    err = np.sqrt(((preds - gts[:, None, :, :]) ** 2).sum(-1))  # [B, K, T]
    ade_per_mode = err.mean(-1)  # [B, K]
    fde_per_mode = err[:, :, -1]  # [B, K]

    if log_style:
        # Training-log variant: mode chosen by min FDE, ADE of that mode.
        min_idcs = fde_per_mode.argmin(1)
        rows = np.arange(len(preds))
        min_ade = ade_per_mode[rows, min_idcs].mean()
        min_fde = fde_per_mode[rows, min_idcs].mean()
        mr = (fde_per_mode[rows, min_idcs] > miss_threshold).mean()
    else:
        min_ade = ade_per_mode.min(1).mean()
        min_fde = fde_per_mode.min(1).mean()
        mr = (fde_per_mode.min(1) > miss_threshold).mean()
    return {
        f"minADE_{k}": float(min_ade),
        f"minFDE_{k}": float(min_fde),
        f"MR_{k}": float(mr),
    }


def evaluate_predictions(
    preds: np.ndarray, gts: np.ndarray, miss_threshold: float = 2.0
) -> Dict[str, float]:
    """The reference eval report: K=6 and K=1 (test.py:101-109)."""
    out = {}
    out.update(forecasting_metrics(preds, gts, k=6, miss_threshold=miss_threshold))
    out.update(forecasting_metrics(preds, gts, k=1, miss_threshold=miss_threshold))
    return out
