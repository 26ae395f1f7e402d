"""Reference-checkpoint importer: torch state_dict ⇄ flax params.

The reference publishes a pretrained LaneGCN checkpoint (`36.000.ckpt`,
README.MD:88) saved by its training driver as ``{"epoch", "state_dict",
"opt_state"}`` (reference train.py:230-242).  This module maps that torch
``state_dict`` — module-qualified names like
``actor_net.groups.0.0.conv1.weight`` — onto our flax param tree, so
real-data eval parity against the reference's published numbers is one
command (``cli.py eval --torch-weight 36.000.ckpt``) once Argoverse data is
on disk.

The name/layout table is derived from the reference module structure
(reference lanegcn.py:94-737, layers.py:40-238):

- ``nn.Linear`` weights are [out, in] → our ``Dense`` kernels are [in, out]
  (transpose).
- ``nn.Conv1d`` weights are [out, in, k] → our ``Conv1dBlock``/``Res1d``
  kernels are [k, in, out] (axis permutation (2, 1, 0)).
- GroupNorm affine vectors copy through unchanged.
- The 14 per-relation LaneConv weights (``fuse.pre0..5/suc0..5/left/right``,
  reference lanegcn.py:294-307) are *stacked* on our side into one
  ``rel_kernel_{i}`` tensor of shape [R, C, C] in ``relation_names`` order
  (pre0..preS, suc0..sucS, left, right) so the stack contracts in a single
  einsum.

``export_state_dict`` is the exact inverse, used by the round-trip test
(export → import → bitwise equality) and by the strict-load test against
the actual reference ``Net`` (``load_state_dict(strict=True)`` proves every
name and shape in the table matches the reference's real module tree).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from lanegcn_tpu.config import ModelConfig, relation_names

# transform kinds
_LIN = "linear"      # torch [out, in]      → flax [in, out]
_CONV = "conv1d"     # torch [out, in, k]   → flax [k, in, out]
_COPY = "copy"       # identical layout (norm vectors, biases)

# An entry maps one torch key to one flax leaf (path tuple) — or, for the
# stacked relation kernels, to a slice (path, relation_index).
Entry = Tuple[str, Tuple[str, ...], str, int | None]


def _norm(t: str, f: Tuple[str, ...]) -> List[Entry]:
    return [
        (f"{t}.weight", f + ("weight",), _COPY, None),
        (f"{t}.bias", f + ("bias",), _COPY, None),
    ]


def _dense(t: str, f: Tuple[str, ...], bias: bool = True) -> List[Entry]:
    out = [(f"{t}.weight", f + ("kernel",), _LIN, None)]
    if bias:
        out.append((f"{t}.bias", f + ("bias",), _COPY, None))
    return out


def _linear_block(t: str, f: Tuple[str, ...]) -> List[Entry]:
    """Reference layers.Linear (linear + norm) → our Linear submodule."""
    return _dense(f"{t}.linear", f + ("linear",), bias=False) + _norm(f"{t}.norm", f + ("norm",))


def _linear_res(t: str, f: Tuple[str, ...], transform: bool = False) -> List[Entry]:
    """Reference layers.LinearRes → our LinearRes (reference layers.py:193-238)."""
    out = (
        _dense(f"{t}.linear1", f + ("linear1",), bias=False)
        + _norm(f"{t}.norm1", f + ("norm1",))
        + _dense(f"{t}.linear2", f + ("linear2",), bias=False)
        + _norm(f"{t}.norm2", f + ("norm2",))
    )
    if transform:
        out += _dense(f"{t}.transform.0", f + ("transform_linear",), bias=False)
        out += _norm(f"{t}.transform.1", f + ("transform_norm",))
    return out


def _res1d(t: str, f: Tuple[str, ...], downsample: bool) -> List[Entry]:
    """Reference layers.Res1d → our Res1d (reference layers.py:142-190)."""
    out = [
        (f"{t}.conv1.weight", f + ("conv1_kernel",), _CONV, None),
        (f"{t}.conv2.weight", f + ("conv2_kernel",), _CONV, None),
    ]
    out += _norm(f"{t}.bn1", f + ("bn1",)) + _norm(f"{t}.bn2", f + ("bn2",))
    if downsample:
        out.append((f"{t}.downsample.0.weight", f + ("downsample_kernel",), _CONV, None))
        out += _norm(f"{t}.downsample.1", f + ("downsample_norm",))
    return out


def _att(t: str, f: Tuple[str, ...]) -> List[Entry]:
    """Reference Att (lanegcn.py:634-710) → our fusion.Att.

    The ctx MLP consumes concat([dist, query, ctx]) — our SplitLinear
    ``ctx_hidden`` holds the same [3C, n_agt] kernel with identical segment
    order, so the mapping is a plain transpose.
    """
    return (
        _dense(f"{t}.dist.0", f + ("dist_dense",))
        + _linear_block(f"{t}.dist.2", f + ("dist_out",))
        + _linear_block(f"{t}.query", f + ("query",))
        + _linear_block(f"{t}.ctx.0", f + ("ctx_hidden",))
        + _dense(f"{t}.ctx.1", f + ("ctx_out",), bias=False)
        + _dense(f"{t}.agt", f + ("agt",), bias=False)
        + _norm(f"{t}.norm", f + ("norm",))
        + _linear_block(f"{t}.linear", f + ("linear",))
    )


def _fuse_stack(t: str, f: Tuple[str, ...], num_scales: int, layers: int) -> List[Entry]:
    """Reference MapNet/M2M fuse ModuleDict (lanegcn.py:289-308) → our
    LaneConvStack: per-relation nn.Linear weights become slices of the
    stacked ``rel_kernel_{i}`` [R, C, C]."""
    names = relation_names(num_scales)
    out: List[Entry] = []
    for i in range(layers):
        out.append((f"{t}.ctr.{i}.weight", f + (f"ctr_{i}", "kernel"), _LIN, None))
        for r, name in enumerate(names):
            out.append((f"{t}.{name}.{i}.weight", f + (f"rel_kernel_{i}",), _LIN, r))
        out += _norm(f"{t}.norm.{i}", f + (f"norm_{i}",))
        out += _linear_block(f"{t}.ctr2.{i}", f + (f"ctr2_{i}",))
    return out


def lanegcn_table(cfg: ModelConfig) -> List[Entry]:
    """Full LaneGCN Net mapping (reference lanegcn.py:94-151 module tree)."""
    entries: List[Entry] = []

    # ActorNet (reference lanegcn.py:212-263): 3 groups × 2 Res1d blocks;
    # block 0 of each group changes width (and strides for groups 1-2) so it
    # carries a downsample path; block 1 never does.
    for g in range(3):
        entries += _res1d(f"actor_net.groups.{g}.0", ("actor_net", f"group{g}_block0"), True)
        entries += _res1d(f"actor_net.groups.{g}.1", ("actor_net", f"group{g}_block1"), False)
    for i in range(3):
        entries.append(
            (f"actor_net.lateral.{i}.conv.weight", ("actor_net", f"lateral{i}", "kernel"), _CONV, None)
        )
        entries += _norm(f"actor_net.lateral.{i}.norm", ("actor_net", f"lateral{i}", "norm"))
    entries += _res1d("actor_net.output", ("actor_net", "output"), False)

    # MapNet (lanegcn.py:266-363): input/seg embeds + fuse stack.
    entries += _dense("map_net.input.0", ("map_net", "input_dense"))
    entries += _linear_block("map_net.input.2", ("map_net", "input_out"))
    entries += _dense("map_net.seg.0", ("map_net", "seg_dense"))
    entries += _linear_block("map_net.seg.2", ("map_net", "seg_out"))
    entries += _fuse_stack("map_net.fuse", ("map_net", "fuse"), cfg.num_scales, cfg.num_fuse_layers)

    # A2M (lanegcn.py:366-407): meta Linear + 2 Att.
    entries += _linear_block("a2m.meta", ("a2m", "meta"))
    for i in range(cfg.num_att_layers):
        entries += _att(f"a2m.att.{i}", ("a2m", f"att{i}"))

    # M2M (lanegcn.py:410-480): bare fuse stack.
    entries += _fuse_stack("m2m.fuse", ("m2m", "fuse"), cfg.num_scales, cfg.num_fuse_layers)

    # M2A / A2A (lanegcn.py:483-545): 2 Att each.
    for mod in ("m2a", "a2a"):
        for i in range(cfg.num_att_layers):
            entries += _att(f"{mod}.att.{i}", (mod, f"att{i}"))

    # PredNet (lanegcn.py:575-631).
    for m in range(cfg.num_mods):
        entries += _linear_res(f"pred_net.pred.{m}.0", ("pred_net", f"pred{m}_res"))
        entries += _dense(f"pred_net.pred.{m}.1", ("pred_net", f"pred{m}_out"))
    entries += _dense("pred_net.att_dest.dist.0", ("pred_net", "att_dest", "dist_dense"))
    entries += _linear_block("pred_net.att_dest.dist.2", ("pred_net", "att_dest", "dist_out"))
    entries += _linear_block("pred_net.att_dest.agt", ("pred_net", "att_dest", "agt"))
    entries += _linear_res("pred_net.cls.0", ("pred_net", "cls_res"))
    entries += _dense("pred_net.cls.1", ("pred_net", "cls_out"))
    return entries




def _pooling(t: str, f: Tuple[str, ...]) -> List[Entry]:
    """Reference LanePooling (lanercnn.py:433-514) → our models.lanercnn
    LanePooling. The ctx MLP consumes concat([ctx_feat, dist_feat])
    (lanercnn.py:499) — our SplitLinear ``ctx_hidden`` holds the same
    [2C, C] kernel in that segment order."""
    return (
        _dense(f"{t}.input", f + ("input",), bias=False)
        + _dense(f"{t}.relpose.0", f + ("relpose",))
        + _linear_block(f"{t}.ctx.0", f + ("ctx_hidden",))
        + _dense(f"{t}.ctx.1", f + ("ctx_out",), bias=False)
        + _linear_block(f"{t}.mlp.0", f + ("mlp1",))
        + _linear_block(f"{t}.mlp.1", f + ("mlp2",))
        + _norm(f"{t}.norm", f + ("norm",))
    )


def lanercnn_table(cfg: ModelConfig) -> List[Entry]:
    """Full LaneRCNN Net mapping (reference lanercnn.py:85-119 module tree:
    input → roi_net1 → interactor → roi_net2 → decode)."""
    entries: List[Entry] = []

    # LaneInput (lanercnn.py:280-351).
    entries.append(("input.map_fc.weight", ("input", "map_fc", "kernel"), _LIN, None))
    entries.append(("input.agt_fc.weight", ("input", "agt_fc", "kernel"), _LIN, None))
    entries += _norm("input.bn", ("input", "bn"))

    # roi_net1 / roi_net2 (lanercnn.py:354-430): input Linear + fuse stack.
    for mod in ("roi_net1", "roi_net2"):
        entries += _linear_block(f"{mod}.input", (mod, "input"))
        entries += _fuse_stack(
            f"{mod}.fuse", (mod, "fuse"), cfg.num_scales, cfg.num_fuse_layers
        )

    # Interactor (lanercnn.py:603-642): embeds + 2 poolings + global stack.
    entries += _dense("interactor.input.0", ("interactor", "input_dense"))
    entries += _linear_block("interactor.input.2", ("interactor", "input_out"))
    entries += _dense("interactor.seg.0", ("interactor", "seg_dense"))
    entries += _linear_block("interactor.seg.2", ("interactor", "seg_out"))
    entries += _pooling("interactor.roi2graph", ("interactor", "roi2graph"))
    entries += _fuse_stack(
        "interactor.global_graph_net.fuse", ("interactor", "global_graph"),
        cfg.num_scales, cfg.num_fuse_layers,
    )
    entries += _pooling("interactor.graph2roi", ("interactor", "graph2roi"))

    # Decode (lanercnn.py:740-924).
    entries += _linear_block("decode.pred.0", ("decode", "pred_hidden"))
    entries += _dense("decode.pred.1", ("decode", "pred_out"))
    entries += _dense("decode.agt_layer1.0", ("decode", "agt1_dense"))
    entries += _linear_block("decode.agt_layer1.2", ("decode", "agt1_out"))
    entries += _dense("decode.agt_layer2.0", ("decode", "agt2_dense"))
    entries += _linear_block("decode.agt_layer2.2", ("decode", "agt2_out"))
    entries += _pooling("decode.lane_pool", ("decode", "lane_pool"))
    entries += _linear_block("decode.refinement.0", ("decode", "refine_hidden"))
    entries += _dense("decode.refinement.1", ("decode", "refine_out"))
    return entries


def model_table(cfg: ModelConfig, model: str) -> List[Entry]:
    if model == "lanercnn":
        return lanercnn_table(cfg)
    return lanegcn_table(cfg)


def _to_flax(value: np.ndarray, kind: str) -> np.ndarray:
    if kind == _LIN:
        return np.ascontiguousarray(value.T)
    if kind == _CONV:
        return np.ascontiguousarray(value.transpose(2, 1, 0))
    return np.asarray(value)


def _to_torch(value: np.ndarray, kind: str) -> np.ndarray:
    if kind == _LIN:
        return np.ascontiguousarray(value.T)
    if kind == _CONV:
        return np.ascontiguousarray(value.transpose(2, 1, 0))
    return np.asarray(value)


def _set_leaf(tree: Dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _get_leaf(tree: Dict, path: Tuple[str, ...]):
    node = tree
    for key in path:
        node = node[key]
    return node


def strip_prefixes(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop DDP's ``module.`` wrapper prefix (reference
    train_lrcnn_torch.py saves ``net.module.state_dict()``)."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }


def import_state_dict(
    state_dict: Dict[str, np.ndarray], cfg: ModelConfig, model: str = "lanegcn"
) -> Dict:
    """torch LaneGCN/LaneRCNN state_dict (numpy values) → flax ``params``.

    Strict: every table entry must be present, and every checkpoint key must
    be consumed (unknown keys raise, so silent architecture drift is
    impossible).
    """
    state_dict = strip_prefixes(state_dict)
    table = model_table(cfg, model)
    missing = [t for t, _, _, _ in table if t not in state_dict]
    if missing:
        raise KeyError(f"checkpoint missing {len(missing)} keys, e.g. {missing[:5]}")
    known = {t for t, _, _, _ in table}
    unknown = sorted(k for k in state_dict if k not in known)
    if unknown:
        raise KeyError(f"checkpoint has {len(unknown)} unmapped keys, e.g. {unknown[:5]}")

    params: Dict = {}
    rel_slices: Dict[Tuple[str, ...], Dict[int, np.ndarray]] = {}
    for tkey, fpath, kind, rel in table:
        value = np.asarray(state_dict[tkey], np.float32)
        if rel is not None:
            rel_slices.setdefault(fpath, {})[rel] = _to_flax(value, kind)
        else:
            _set_leaf(params, fpath, _to_flax(value, kind))
    for fpath, slices in rel_slices.items():
        stacked = np.stack([slices[r] for r in range(len(slices))], axis=0)
        _set_leaf(params, fpath, stacked)
    return params


def export_state_dict(
    params: Dict, cfg: ModelConfig, model: str = "lanegcn"
) -> Dict[str, np.ndarray]:
    """flax ``params`` tree → torch state_dict layout (numpy values).

    Exact inverse of :func:`import_state_dict`; used for round-trip testing
    and for handing our trained weights to the reference's eval stack.
    """
    out: Dict[str, np.ndarray] = {}
    for tkey, fpath, kind, rel in model_table(cfg, model):
        leaf = np.asarray(_get_leaf(params, fpath), np.float32)
        if rel is not None:
            leaf = leaf[rel]
        out[tkey] = _to_torch(leaf, kind)
    return out


def load_torch_checkpoint(path: str, cfg: ModelConfig, model: str = "lanegcn") -> Dict:
    """Load a reference ``*.ckpt`` file and return flax params.

    Accepts both the training-driver format ``{"state_dict": ...}``
    (reference train.py:234-241) and a bare state_dict.
    """
    import torch

    try:
        # Safe path first: plain state_dict checkpoints (the published
        # 36.000.ckpt case) need no arbitrary unpickling.
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        import warnings

        warnings.warn(
            f"{path}: weights_only load failed; falling back to full "
            "unpickling — only do this for checkpoints you trust",
            stacklevel=2,
        )
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    sd_np = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    return import_state_dict(sd_np, cfg, model)
