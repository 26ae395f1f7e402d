"""LaneRCNN torch bridge (utils/torch_import.lanercnn_table): round-trip,
strict load into the ACTUAL reference lanercnn Net, and forward parity
through it — the RCNN twin of tests/test_torch_import.py."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from lanegcn_tpu.config import ModelConfig, RoiPackConfig
from lanegcn_tpu.data import make_synthetic_scenario
from lanegcn_tpu.data.lane_roi import generate_lane_rois
from lanegcn_tpu.data.packing_roi import pack_roi_batch
from lanegcn_tpu.models.lanercnn import LaneRCNN
from lanegcn_tpu.utils.torch_import import export_state_dict, import_state_dict

ROI_PACK = RoiPackConfig(
    max_scenarios=2, max_rois=8, max_roi_nodes=1024, max_interest_nodes=256,
    max_global_nodes=512, max_edges_scale0=1024, max_edges_dilated=1024,
    max_edges_lr=1024, max_a2m_edges=256, max_pool_edges=8192, max_a2r_edges=512,
)


@pytest.fixture(scope="module")
def reference_lanercnn():
    from tools.ref_shim import load_reference_lanercnn

    ref = load_reference_lanercnn()
    if ref is None:
        pytest.skip("/root/reference not mounted")
    return ref


@pytest.fixture(scope="module")
def setup():
    mcfg = ModelConfig()
    scens = [
        generate_lane_rois(
            make_synthetic_scenario(seed=400 + i, num_corridors=1, num_actors=4)
        )
        for i in range(2)
    ]
    batch, stats = pack_roi_batch(scens, ROI_PACK, mcfg)
    assert stats["packed_scenarios"] == 2, stats
    drops = {k: v for k, v in stats.items()
             if k.startswith(("dropped", "skipped")) and np.any(v)}
    assert not drops, drops  # parity needs every edge
    batch = jax.tree.map(jnp.asarray, batch)
    net = LaneRCNN(mcfg)
    params = net.init(jax.random.PRNGKey(5), batch)["params"]
    return mcfg, scens, batch, net, params


def test_rcnn_roundtrip_bitwise(setup):
    mcfg, _, _, _, params = setup
    sd = export_state_dict(params, mcfg, model="lanercnn")
    back = import_state_dict(sd, mcfg, model="lanercnn")
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    for path, leaf in flat_a:
        node = back
        for k in path:
            node = node[k.key]
        np.testing.assert_array_equal(np.asarray(leaf, np.float32), node)


def test_rcnn_strict_load_into_reference_net(setup, reference_lanercnn):
    """load_state_dict(strict=True) pins every key name and shape of the
    RCNN mapping table against the reference's real module tree
    (reference lanercnn.py:85-119)."""
    mcfg, _, _, _, params = setup
    ref = reference_lanercnn
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_state_dict(params, mcfg, model="lanercnn").items()
    }
    net = ref.Net(ref.config)
    net.load_state_dict(sd, strict=True)


def test_rcnn_forward_parity_with_reference_net(setup, reference_lanercnn):
    """Same weights, same scenario: the ACTUAL reference torch lanercnn Net
    vs our flax LaneRCNN (agent-frame decode outputs).

    Runs one scenario per pack: the reference Decode's refinement pooling
    has an off-by-scenario indexing bug for batch > 1 — its context offset
    advances by ``len(context_ctrs)`` where the motion-graph ctrs lists are
    [1, T, 2]-shaped (reference lanercnn.py:474-479 with the lists built at
    :836-837, 878-880), i.e. by 1 instead of T, so every scenario after the
    first pools the WRONG agent's motion features. We implement the intended
    semantics (verified here at batch 1, where the bug cannot fire)."""
    import dataclasses

    from tools.ref_shim import reference_roi_data

    mcfg, scens, _, net, params = setup
    ref = reference_lanercnn
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_state_dict(params, mcfg, model="lanercnn").items()
    }
    ref_net = ref.Net(ref.config)
    ref_net.load_state_dict(sd, strict=True)
    ref_net.eval()

    pack1 = dataclasses.replace(ROI_PACK, max_scenarios=1, max_rois=4)
    for scen in scens:
        batch, stats = pack_roi_batch([scen], pack1, mcfg)
        assert stats["packed_scenarios"] == 1
        batch = jax.tree.map(jnp.asarray, batch)
        out = net.apply({"params": params}, batch)
        with torch.no_grad():
            ref_out = ref_net(reference_roi_data([scen]))
        for key, tol in (
            ("pred_logics", 2e-3), ("pred_goals", 2e-3), ("pred_trajs", 6e-3)
        ):
            ours = np.asarray(out[key])[:1]
            theirs = ref_out[key]
            theirs = (
                theirs.numpy() if torch.is_tensor(theirs)
                else torch.stack(list(theirs)).numpy()
            )
            np.testing.assert_allclose(
                ours, theirs[:1], rtol=tol, atol=tol, err_msg=key
            )
