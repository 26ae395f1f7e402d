"""Reference-checkpoint importer tests (utils/torch_import.py).

Three levels of proof:
1. round-trip: our params → torch layout → back is bitwise identical;
2. strict load: the exported state_dict loads into the ACTUAL reference
   ``Net`` with ``strict=True`` — every key name and shape in the mapping
   table is pinned against the reference's real module tree
   (reference lanegcn.py:94-737);
3. forward parity: the reference net (running its own torch code) and our
   flax model produce the same outputs from the same weights on the same
   scenarios — the checkpoint-transfer path is end-to-end correct.

Levels 2-3 import the reference from /root/reference behind small shims
(py2-era ``fractions.gcd``, stubs for its ``data``/``utils`` modules whose
heavy deps — argoverse-api, cv2 — aren't installed) and are skipped when the
reference tree is absent.
"""

import math
import os
import sys
import types

import numpy as np
import pytest
import torch

from lanegcn_tpu.config import ModelConfig, PackConfig
from lanegcn_tpu.data import make_synthetic_scenario, pack_batch
from lanegcn_tpu.models.lanegcn import LaneGCN
from lanegcn_tpu.utils.torch_import import (
    export_state_dict,
    import_state_dict,
    lanegcn_table,
    load_torch_checkpoint,
)

REF = "/root/reference"

import jax
import jax.numpy as jnp


def _flat_pack(num_scen=2):
    mcfg = ModelConfig()
    pc = PackConfig(
        max_scenarios=num_scen, max_actors=16, max_nodes=1024,
        max_edges_scale0=2048, max_edges_dilated=2048, max_edges_lr=1024,
        max_a2m_edges=8192, max_m2a_edges=8192, max_a2a_edges=256,
    )
    scens = [
        make_synthetic_scenario(seed=40 + i, num_corridors=2, num_actors=4)
        for i in range(num_scen)
    ]
    flat, stats = pack_batch(scens, pc, mcfg, split_bands=False, split_tables=False)
    assert stats["packed_scenarios"] == num_scen
    assert not any(v for k, v in stats.items() if k.startswith("dropped")), stats
    return mcfg, scens, jax.tree.map(jnp.asarray, flat)


def _init_params(mcfg, batch):
    net = LaneGCN(mcfg)
    return net, net.init(jax.random.PRNGKey(3), batch)["params"]


def test_roundtrip_bitwise():
    mcfg, _, batch = _flat_pack()
    _, params = _init_params(mcfg, batch)
    sd = export_state_dict(params, mcfg)
    back = import_state_dict(sd, mcfg)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    paths_a = ["/".join(str(k.key) for k in p) for p, _ in flat_a]
    paths_b = ["/".join(str(k.key) for k in p) for p, _ in flat_b]
    assert sorted(paths_a) == sorted(paths_b)
    by_path = dict(zip(paths_b, (leaf for _, leaf in flat_b)))
    for path, leaf in flat_a:
        key = "/".join(str(k.key) for k in path)
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(by_path[key]), err_msg=key)


def test_import_rejects_unknown_and_missing_keys():
    mcfg, _, batch = _flat_pack()
    _, params = _init_params(mcfg, batch)
    sd = export_state_dict(params, mcfg)

    extra = dict(sd)
    extra["pred_net.bogus.weight"] = np.zeros(3, np.float32)
    with pytest.raises(KeyError, match="unmapped"):
        import_state_dict(extra, mcfg)

    short = dict(sd)
    short.pop("actor_net.output.conv1.weight")
    with pytest.raises(KeyError, match="missing"):
        import_state_dict(short, mcfg)


def test_load_torch_checkpoint_driver_format(tmp_path):
    """The reference training driver saves {"epoch","state_dict","opt_state"}
    (reference train.py:230-242); the loader must unwrap it."""
    mcfg, _, batch = _flat_pack()
    _, params = _init_params(mcfg, batch)
    sd = {k: torch.from_numpy(v) for k, v in export_state_dict(params, mcfg).items()}
    path = tmp_path / "36.000.ckpt"
    torch.save({"epoch": 36.0, "state_dict": sd, "opt_state": {}}, path)
    back = load_torch_checkpoint(str(path), mcfg)
    np.testing.assert_array_equal(
        np.asarray(back["pred_net"]["cls_out"]["kernel"]),
        np.asarray(params["pred_net"]["cls_out"]["kernel"]),
    )


def test_table_has_no_duplicate_targets():
    mcfg = ModelConfig()
    table = lanegcn_table(mcfg)
    tkeys = [t for t, _, _, _ in table]
    assert len(tkeys) == len(set(tkeys))
    targets = [(f, r) for _, f, _, r in table]
    assert len(targets) == len(set(targets))


# ---------------------------------------------------------------------------
# Against the actual reference implementation.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def reference_lanegcn():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")
    import fractions

    if not hasattr(fractions, "gcd"):  # removed in py3.9
        fractions.gcd = math.gcd

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

    # The reference's data/utils modules pull argoverse-api and cv2 (not
    # installed); Net only needs gpu/to_long, which are identity-ish on CPU.
    data_stub = types.ModuleType("data")
    data_stub.ArgoDataset = object
    data_stub.collate_fn = None
    class _StepLR:
        # Instantiated at reference module import time (lanegcn.py:39).
        def __init__(self, lr, lr_epochs):
            self.lr, self.lr_epochs = lr, lr_epochs

    utils_stub = types.ModuleType("utils")
    utils_stub.gpu = _identity
    utils_stub.to_long = _to_long
    utils_stub.Optimizer = object
    utils_stub.StepLR = _StepLR

    saved = {k: sys.modules.get(k) for k in ("data", "utils", "layers", "lanegcn")}
    sys.modules["data"] = data_stub
    sys.modules["utils"] = utils_stub
    sys.path.insert(0, REF)
    try:
        import importlib

        for name in ("layers", "lanegcn"):
            if saved[name] is not None:
                del sys.modules[name]
        ref = importlib.import_module("lanegcn")
        yield ref
    finally:
        sys.path.remove(REF)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _reference_data(scens):
    """Our scenario dicts → the reference Net's input format
    (lists of per-scenario tensors, reference data.py:555-575 collate)."""

    def tt(x, dtype=torch.float32):
        return torch.as_tensor(np.asarray(x)).to(dtype)

    data = {"feats": [], "ctrs": [], "graph": [], "rot": [], "orig": []}
    for s in scens:
        data["feats"].append(tt(s["feats"]))
        data["ctrs"].append(tt(s["ctrs"]))
        data["rot"].append(tt(s["rot"]))
        data["orig"].append(tt(s["orig"]))
        g = s["graph"]
        graph = {
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
        }
        data["graph"].append(graph)
    return data


def test_strict_load_into_reference_net(reference_lanegcn):
    """load_state_dict(strict=True) pins every key name and shape of the
    mapping table against the reference's real module tree."""
    ref = reference_lanegcn
    mcfg, _, batch = _flat_pack()
    _, params = _init_params(mcfg, batch)
    sd = {k: torch.from_numpy(v) for k, v in export_state_dict(params, mcfg).items()}
    net = ref.Net(ref.config)
    net.load_state_dict(sd, strict=True)


def test_forward_parity_with_reference_net(reference_lanegcn):
    """Same weights, same scenarios: reference torch Net vs our flax model."""
    ref = reference_lanegcn
    mcfg, scens, batch = _flat_pack(num_scen=2)
    net, params = _init_params(mcfg, batch)

    out = net.apply({"params": params}, batch)
    cls_ours = np.asarray(out["cls"])
    reg_ours = np.asarray(out["reg"])

    sd = {k: torch.from_numpy(v) for k, v in export_state_dict(params, mcfg).items()}
    ref_net = ref.Net(ref.config)
    ref_net.load_state_dict(sd, strict=True)
    ref_net.eval()
    with torch.no_grad():
        ref_out = ref_net(_reference_data(scens))

    mask = np.asarray(batch.actors.mask)
    scen_of = np.asarray(batch.actors.scen)
    for i in range(len(scens)):
        rows = np.where(mask & (scen_of == i))[0]
        cls_ref = ref_out["cls"][i].numpy()
        reg_ref = ref_out["reg"][i].numpy()
        assert len(rows) == len(cls_ref)
        np.testing.assert_allclose(cls_ours[rows], cls_ref, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(reg_ours[rows], reg_ref, rtol=2e-3, atol=2e-3)
