"""Import the reference LaneGCN (torch) from /root/reference behind shims.

The reference is py2-era (`from fractions import gcd`) and its data/utils
modules pull argoverse-api and cv2, which aren't installed; `Net`, `Loss`
and the config dict don't need any of that. Used by tools/convergence.py and
mirrored by the fixture in tests/test_torch_import.py.
"""

from __future__ import annotations

import importlib
import math
import os
import sys
import types

REF = "/root/reference"


def load_reference_lanegcn():
    """Returns the reference `lanegcn` module, or None if not mounted."""
    if not os.path.isdir(REF):
        return None
    import fractions

    if not hasattr(fractions, "gcd"):
        fractions.gcd = math.gcd

    import torch

    def _identity(x):
        return x

    def _to_long(data):
        if torch.is_tensor(data) and data.dtype == torch.int16:
            return data.long()
        if isinstance(data, dict):
            return {k: _to_long(v) for k, v in data.items()}
        if isinstance(data, list):
            return [_to_long(v) for v in data]
        return data

    class _StepLR:
        def __init__(self, lr, lr_epochs):
            self.lr, self.lr_epochs = list(lr), list(lr_epochs)

        def __call__(self, epoch):
            idx = 0
            for e in self.lr_epochs:
                if epoch >= e:
                    idx += 1
            return self.lr[idx]

    data_stub = types.ModuleType("data")
    data_stub.ArgoDataset = object
    data_stub.collate_fn = None
    utils_stub = types.ModuleType("utils")
    utils_stub.gpu = _identity
    utils_stub.to_long = _to_long
    utils_stub.Optimizer = object
    utils_stub.StepLR = _StepLR

    sys.modules.setdefault("data", data_stub)
    sys.modules.setdefault("utils", utils_stub)
    sys.path.insert(0, REF)
    try:
        return importlib.import_module("lanegcn")
    finally:
        sys.path.remove(REF)


def reference_data(scens):
    """Our scenario dicts → the reference Net/Loss input format."""
    import numpy as np
    import torch

    def tt(x, dtype=torch.float32):
        return torch.as_tensor(np.asarray(x)).to(dtype)

    data = {
        "feats": [], "ctrs": [], "graph": [], "rot": [], "orig": [],
        "gt_preds": [], "has_preds": [],
    }
    for s in scens:
        data["feats"].append(tt(s["feats"]))
        data["ctrs"].append(tt(s["ctrs"]))
        data["rot"].append(tt(s["rot"]))
        data["orig"].append(tt(s["orig"]))
        data["gt_preds"].append(tt(s["gt_preds"]))
        data["has_preds"].append(tt(s["has_preds"], torch.bool))
        g = s["graph"]
        data["graph"].append({
            "num_nodes": int(g["num_nodes"]),
            "ctrs": tt(g["ctrs"]),
            "feats": tt(g["feats"]),
            "turn": tt(g["turn"]),
            "control": tt(g["control"]),
            "intersect": tt(g["intersect"]),
            "pre": [
                {"u": tt(e["u"], torch.int64), "v": tt(e["v"], torch.int64)}
                for e in g["pre"]
            ],
            "suc": [
                {"u": tt(e["u"], torch.int64), "v": tt(e["v"], torch.int64)}
                for e in g["suc"]
            ],
            "left": {
                "u": tt(g["left"]["u"], torch.int64),
                "v": tt(g["left"]["v"], torch.int64),
            },
            "right": {
                "u": tt(g["right"]["u"], torch.int64),
                "v": tt(g["right"]["v"], torch.int64),
            },
        })
    return data
