"""Recipe-fidelity regression: our trainer tracks the ACTUAL reference.

Short version of tools/convergence.py (the committed multi-epoch curves in
docs/convergence_r02.json are the full run): both sides start from the SAME
weights, consume the SAME scenarios in the SAME order under the reference
recipe (Adam, lr 1e-3; reference lanegcn.py:36-39, utils.py:98-162), and
their loss curves must track. This is what activation parity alone cannot
prove — that init + optimizer + schedule + loss + data wiring match as a
system (the reference's own stand-in is its golden log, misc/train_log.txt).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lanegcn_tpu.config import Config, TrainConfig
from lanegcn_tpu.data import pack_batch
from lanegcn_tpu.models.registry import get_model

pytestmark = pytest.mark.slow


@pytest.mark.skipif(not os.path.isdir("/root/reference"), reason="reference not mounted")
def test_training_tracks_reference_torch():
    from tools.convergence import PACK, _chunks, _scenarios, run_ours, run_reference
    from tools.ref_shim import load_reference_lanegcn

    ref = load_reference_lanegcn()
    epochs = 2
    train_chunks = _chunks(_scenarios(16, seed0=300), 2)
    val_chunks = _chunks(_scenarios(4, seed0=20_300), 2)

    config = Config(
        pack=PACK,
        train=TrainConfig(lr=(1e-3, 1e-4), lr_epochs=(100.0,), num_epochs=epochs),
    )
    bundle = get_model("lanegcn", config)
    config = bundle.config

    def pack(chunks):
        out = []
        for c in chunks:
            b, stats = pack_batch(c, config.pack, config.model)
            assert stats["packed_scenarios"] == len(c), stats
            out.append(jax.tree.map(jnp.asarray, b))
        return out

    train_batches = pack(train_chunks)
    val_batches = pack(val_chunks)
    params0 = bundle.net.init(jax.random.PRNGKey(5), train_batches[0])["params"]

    ours = run_ours(config, bundle, params0, train_batches, val_batches, epochs)
    theirs = run_reference(
        ref, params0, config.model, train_chunks, val_chunks, epochs, (1e-3, 1e-4), 100.0
    )

    # Both recipes must learn…
    assert ours["loss"][-1] < 0.8 * ours["loss"][0]
    assert theirs["loss"][-1] < 0.8 * theirs["loss"][0]
    # …and track each other: same init/data/recipe ⇒ same trajectory up to
    # fp accumulation (bf16 off in both; tolerances cover op-order drift,
    # which the full 12-epoch run shows is larger for the min-FDE-mode
    # metrics than for the loss — docs/convergence_r02.json).
    np.testing.assert_allclose(ours["loss"], theirs["loss"], rtol=0.12)
    for k in ("ade", "fde"):
        np.testing.assert_allclose(ours[k], theirs[k], rtol=0.3, err_msg=k)


@pytest.mark.skipif(not os.path.isdir("/root/reference"), reason="reference not mounted")
def test_rcnn_training_tracks_reference_torch():
    """LaneRCNN twin: our trainer vs the ACTUAL reference lanercnn module
    (AdamW + wd recipe, agent-frame gt; batch 1 — see
    tools/convergence_rcnn.py on the reference's batch>1 decode bug)."""
    from tools.convergence_rcnn import (
        ROI_PACK, _scenarios, run_ours, run_reference,
    )
    from tools.ref_shim import load_reference_lanercnn
    from lanegcn_tpu.data.packing_roi import pack_roi_batch

    import dataclasses

    ref = load_reference_lanercnn()
    epochs = 2
    train_scens = _scenarios(6, seed0=70_000)
    val_scens = _scenarios(3, seed0=80_000)

    config = Config(
        roi_pack=ROI_PACK,
        train=TrainConfig(lr=(1e-3, 1e-4), lr_epochs=(100.0,), num_epochs=epochs),
    )
    bundle = get_model("lanercnn", config)
    config = dataclasses.replace(
        bundle.config, roi_pack=ROI_PACK,
        train=dataclasses.replace(
            bundle.config.train, lr=(1e-3, 1e-4), lr_epochs=(100.0,)
        ),
    )
    assert config.train.opt == "adamw"

    def pack(scens):
        out = []
        for s in scens:
            b, stats = pack_roi_batch([s], config.roi_pack, config.model)
            assert stats["packed_scenarios"] == 1, stats
            out.append(jax.tree.map(jnp.asarray, b))
        return out

    train_batches = pack(train_scens)
    val_batches = pack(val_scens)
    params0 = bundle.net.init(jax.random.PRNGKey(9), train_batches[0])["params"]

    ours = run_ours(config, bundle, params0, train_batches, val_batches, epochs)
    theirs = run_reference(
        ref, params0, config.model, train_scens, val_scens, epochs,
        (1e-3, 1e-4), 100.0,
    )
    # Same init/data/recipe ⇒ the early curves must track closely (fp drift
    # compounds later; the full 8-epoch run is docs/convergence_rcnn_r03.json).
    np.testing.assert_allclose(ours["loss"], theirs["loss"], rtol=0.12)
    np.testing.assert_allclose(ours["ade"], theirs["ade"], rtol=0.3)
