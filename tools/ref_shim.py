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


def load_reference_lanercnn():
    """Returns the reference `lanercnn` module, or None if not mounted.

    Extra stubs beyond load_reference_lanegcn: torchvision and
    sklearn.utils (imported at reference lanercnn.py:8,11 but unused by
    Net/Loss), and data_lrcnn (pulls argoverse-api)."""
    if not os.path.isdir(REF):
        return None
    # shared shims (fractions.gcd, data/utils stubs)
    if load_reference_lanegcn() is None:
        return None

    from importlib.machinery import ModuleSpec

    def _stub(name):
        m = types.ModuleType(name)
        # torch.dynamo probes module specs; a bare ModuleType has
        # __spec__=None which breaks importlib.util.find_spec.
        m.__spec__ = ModuleSpec(name, loader=None)
        return m

    if "torchvision" not in sys.modules:
        sys.modules["torchvision"] = _stub("torchvision")
    if "sklearn" not in sys.modules:
        sk = _stub("sklearn")
        sk_utils = _stub("sklearn.utils")
        sk_utils.resample = lambda *a, **k: a
        sk.utils = sk_utils
        sys.modules["sklearn"] = sk
        sys.modules["sklearn.utils"] = sk_utils
    data_lrcnn_stub = types.ModuleType("data_lrcnn")
    data_lrcnn_stub.ArgoDataset = object
    data_lrcnn_stub.collate_fn = None
    sys.modules.setdefault("data_lrcnn", data_lrcnn_stub)

    sys.path.insert(0, REF)
    try:
        return importlib.import_module("lanercnn")
    finally:
        sys.path.remove(REF)


def reference_roi_data(scens):
    """Our RoI scenario dicts (data/lane_roi.generate_lane_rois) → the
    reference lanercnn Net/Loss input format (reference lanercnn.py:97-119:
    data["graph"] per-scenario graph dicts, data["subgraphs"] nested
    per-scenario per-agent RoI dicts, plus the decode/loss fields)."""
    import numpy as np
    import torch

    def tt(x, dtype=torch.float32):
        return torch.as_tensor(np.asarray(x)).to(dtype)

    data = reference_data(scens)
    data["obs_trajs"] = [tt(s["obs_trajs"]) for s in scens]
    data["valid_agent_ids"] = [tt(s["valid_agent_ids"], torch.int64) for s in scens]
    data["subgraphs"] = []
    for s in scens:
        subs = []
        for sg in s["subgraphs"]:
            subs.append({
                "feats": tt(sg["feats"]),
                "agent_feat": tt(sg["agent_feat"]),
                "agent_vel": float(sg["agent_vel"]),
                "a2m": {
                    "u": tt(sg["a2m"]["u"], torch.int64),
                    "v": tt(sg["a2m"]["v"], torch.int64),
                },
                "pre": [
                    {"u": tt(e["u"], torch.int64), "v": tt(e["v"], torch.int64)}
                    for e in sg["pre"]
                ],
                "suc": [
                    {"u": tt(e["u"], torch.int64), "v": tt(e["v"], torch.int64)}
                    for e in sg["suc"]
                ],
                "left": {
                    "u": tt(sg["left"]["u"], torch.int64),
                    "v": tt(sg["left"]["v"], torch.int64),
                },
                "right": {
                    "u": tt(sg["right"]["u"], torch.int64),
                    "v": tt(sg["right"]["v"], torch.int64),
                },
            })
        data["subgraphs"].append(subs)
    return data
