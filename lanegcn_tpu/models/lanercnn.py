"""LaneRCNN: per-agent LaneRoI encoding + anchor-based decoding.

(reference lanercnn.py — active code paths only; commented-out experiments in
the reference are not reproduced)

Pipeline (lanercnn.py:85-119):
    LaneInput → LaneRoI₁ → Interactor(roi2graph → GlobalGraphNet → graph2roi)
    → LaneRoI₂ → Decode(goal head → NMS → quadratic trajectory fit →
    agent-motion LanePooling refinement)

TPU-first notes:
- all RoIs flattened RoI-major into one static buffer (subgraph_gather
  lanercnn.py:122-231 done on host, packing_roi.py),
- the sequential greedy NMS (lanercnn.py:687-708) becomes a fixed-K masked
  argmax loop with per-scenario segmented scoring,
- LanePooling distance edges precomputed on host (exact thresholds).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lanegcn_tpu.config import LossConfig, ModelConfig
from lanegcn_tpu.graph import EdgeSet, RoiPackedBatch
from lanegcn_tpu.models.layers import (
    Dense,
    DenseParams,
    GroupNorm,
    Linear,
    LinearParams,
    SplitLinear,
    _BareGN,
)
from lanegcn_tpu.models.lanegcn import smooth_l1
from lanegcn_tpu.models.map_net import LaneConvStack
from lanegcn_tpu.ops import masked_gather, scatter_add
from lanegcn_tpu.ops.pallas_edge_mlp import fused_edge_mlp
from lanegcn_tpu.ops.pallas_row_tail import fused_row_tail2


class LaneInput(nn.Module):
    """RoI-node embedding + agent-feature scatter (lanercnn.py:280-351)."""

    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch: RoiPackedBatch) -> jax.Array:
        n_map = self.cfg.n_map
        map_feats = Dense(n_map, use_bias=False, dtype=self.dtype, name="map_fc")(
            batch.node_feats
        )
        agt = Dense(n_map, use_bias=False, dtype=self.dtype, name="agt_fc")(
            batch.agent_feat
        )
        msg = masked_gather(agt, batch.a2m.u, batch.a2m.mask)
        map_feats = scatter_add(
            msg, batch.a2m.v, map_feats.shape[0], mask=batch.a2m.mask, out=map_feats
        )
        return nn.relu(GroupNorm(name="bn")(map_feats))


class LaneRoI(nn.Module):
    """Input Linear + 4-layer LaneConv over RoI subgraphs (lanercnn.py:354-430)."""

    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, feat: jax.Array, edges: Dict[str, EdgeSet], bands=None,
        tables=None, table_inv=None, plan=None,
    ) -> jax.Array:
        feat = Linear(self.cfg.n_map, dtype=self.dtype, name="input")(feat)
        return LaneConvStack(
            self.cfg, self.cfg.num_fuse_layers, dtype=self.dtype, name="fuse"
        )(feat, edges, bands, tables, table_inv, plan=plan)


class LanePooling(nn.Module):
    """Bidirectional graph↔graph fusion via rel-pose edge MLP
    (lanercnn.py:433-514). Edges: u → target rows, v → context rows."""

    n: int = 128
    dtype: Any = jnp.float32
    pallas_edge: str = "auto"

    @nn.compact
    def __call__(
        self,
        context_feat: jax.Array,  # [C, n]
        context_pose: jax.Array,  # [C, 4]
        target_feat: jax.Array,  # [Tn, n]
        target_pose: jax.Array,  # [Tn, 4]
        edges: EdgeSet,
    ) -> jax.Array:
        # Per-edge relative pose: context − target (lanercnn.py:494).
        d = masked_gather(context_pose, edges.v, edges.mask) - masked_gather(
            target_pose, edges.u, edges.mask
        )
        # Feature gather: with destination-sorted edges (the pool-edge
        # layout) its backward is one permute + one sorted scatter.
        from lanegcn_tpu.models.fusion import (
            _edge_gather,
            resolve_pallas_mode,
            use_pallas_edge,
        )

        # ctx_hidden = Linear over concat([ctx_gathered, dist]); the context
        # segment is per-source-row, so its kernel slice applies densely at
        # context-row count before the edge gather (lanercnn.py:497-505).
        # NOTE (round-5 A/B, negative): zero_masked=False here is CORRECT
        # (the masked destination scatter drops padding rows; outputs and
        # grads proven identical) and removes the step's top XLA-byte
        # consumer (~538 MB/direction of padding select), but measured
        # SLOWER on v5e — 193.0 -> 200.9 ms reproducibly — the select was
        # evidently the materialization point that let XLA fuse the
        # pool-edge gather with its consumers. Kept masked.
        gather_c = lambda rows: _edge_gather(
            rows, edges.v, edges.mask, edges.inv_perm, edges.inv_dst
        )
        if use_pallas_edge(self.pallas_edge):
            # Fused per-edge chain (ops/pallas_edge_mlp): relpose Dense +
            # relu + K_dist add + GN + relu + ctx_out, without the dist_out
            # stage the Att chain has. Same param tree as the unfused path.
            kd, bd = DenseParams(4, self.n, name="relpose")()
            k_ch, gchw, gchb = LinearParams(2 * self.n, self.n, name="ctx_hidden")()
            kout, _ = DenseParams(self.n, self.n, use_bias=False, name="ctx_out")()
            cg = gather_c(
                jnp.dot(context_feat.astype(self.dtype), k_ch[: self.n].astype(self.dtype))
            )
            # dist2-stage slots are inert under has_dist2=False; fresh
            # constants keep the VJP's gradient shapes trivially consistent.
            kdo = jnp.zeros((self.n, self.n), jnp.float32)
            gdo1 = jnp.ones((self.n,), jnp.float32)
            gdo0 = jnp.zeros((self.n,), jnp.float32)
            ctx = fused_edge_mlp(
                d, None, cg, kd, bd, kdo, gdo1, gdo0, k_ch[self.n :], gchw, gchb,
                kout, False, False, 1e-5, self.pallas_edge == "interpret",
            )
        else:
            dist = nn.relu(Dense(self.n, dtype=self.dtype, name="relpose")(d))
            ctx = SplitLinear(
                self.n, widths=(self.n, self.n), dtype=self.dtype, name="ctx_hidden"
            )([(context_feat, gather_c), (dist, None)])
            ctx = Dense(self.n, use_bias=False, dtype=self.dtype, name="ctx_out")(ctx)

        identity = target_feat
        tgt = Dense(self.n, use_bias=False, dtype=self.dtype, name="input")(target_feat)
        if edges.win_lu is not None:
            # Window-chunked pool edges (data/packing.py window_chunked_edges):
            # the ~936k-message scatter runs as one-hot MXU matmuls per
            # 512-edge chunk (ops/pallas_window_scatter) — XLA's serial-row
            # scatter (and its transpose-gather backward) leave the step.
            from lanegcn_tpu.ops.pallas_window_scatter import window_scatter_add

            # Backend-gated only (not self.pallas_edge): interpret-mode
            # parity for this kernel is covered by its own tests, and the
            # CPU path should stay on the XLA scatter.
            wmode = resolve_pallas_mode("auto")
            tgt = window_scatter_add(
                ctx.astype(tgt.dtype), tgt, edges.win_lu, edges.win_chunk,
                edges.win_first, edges.win_stride, mode=wmode,
            )
        else:
            tgt = scatter_add(
                ctx, edges.u, tgt.shape[0], mask=edges.mask, out=tgt,
                indices_are_sorted=edges.dst_sorted,
            )
        # Tail: GN → ReLU → mlp1 → mlp2 → +res → ReLU (lanercnn.py:497-505).
        # On TPU the chain runs in the fused two-Linear row-tail kernel
        # (ops/pallas_row_tail) — identical param tree either way.
        mode = resolve_pallas_mode(self.pallas_edge)
        if mode != "xla":
            g1w, g1b = _BareGN(self.n, name="norm")()
            k1, g2w, g2b = LinearParams(self.n, self.n, name="mlp1")()
            k2, g3w, g3b = LinearParams(self.n, self.n, name="mlp2")()
            return fused_row_tail2(
                tgt.astype(self.dtype), identity.astype(self.dtype),
                k1, k2, g1w, g1b, g2w, g2b, g3w, g3b, mode=mode,
            )
        tgt = nn.relu(GroupNorm(name="norm")(tgt))
        tgt = Linear(self.n, dtype=self.dtype, name="mlp1")(tgt)
        tgt = Linear(self.n, act=False, dtype=self.dtype, name="mlp2")(tgt)
        return nn.relu(tgt + identity)


class Interactor(nn.Module):
    """RoI → global graph → RoI interaction (lanercnn.py:603-642)."""

    cfg: ModelConfig
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, batch: RoiPackedBatch, roi_feat: jax.Array) -> jax.Array:
        g = batch.graph
        n_map = self.cfg.n_map
        Pool = nn.remat(LanePooling) if self.remat else LanePooling
        emb = Dense(n_map, dtype=self.dtype, name="input_dense")(g.ctrs)
        emb = Linear(n_map, act=False, dtype=self.dtype, name="input_out")(nn.relu(emb))
        seg = Dense(n_map, dtype=self.dtype, name="seg_dense")(g.feats)
        seg = Linear(n_map, act=False, dtype=self.dtype, name="seg_out")(nn.relu(seg))
        graph_input = nn.relu(emb + seg)

        roi_pose = batch.node_feats[:, :4]
        graph_pose = jnp.concatenate([g.ctrs, g.feats], axis=-1)

        graph_feat = Pool(n_map, dtype=self.dtype,
                          pallas_edge=self.cfg.pallas_edge, name="roi2graph")(
            roi_feat, roi_pose, graph_input, graph_pose, batch.r2g
        )
        from lanegcn_tpu.models.map_net import _graph_plan

        graph_feat = LaneConvStack(
            self.cfg, self.cfg.num_fuse_layers, dtype=self.dtype, name="global_graph"
        )(graph_feat, g.edges, g.bands, g.tables, g.table_inv,
          plan=_graph_plan(g))
        roi_feat = Pool(n_map, dtype=self.dtype,
                        pallas_edge=self.cfg.pallas_edge, name="graph2roi")(
            graph_feat, graph_pose, roi_feat, roi_pose, batch.g2r
        )
        return roi_feat


def segmented_nms(
    xy: jax.Array,  # [MI, 2]
    logits: jax.Array,  # [MI]
    seg: jax.Array,  # [MI] scenario id
    mask: jax.Array,  # [MI]
    num_seg: int,
    k: int = 6,
    threshold: float = 2.0,
) -> jax.Array:
    """Fixed-K greedy NMS per segment (reference nms_select lanercnn.py:687-708
    reformulated as a masked argmax loop). Returns [num_seg, k] indices into
    the MI axis. Semantics: pick the highest-logit unsuppressed node; when all
    remaining nodes are suppressed, fall back to highest-logit unchosen."""
    neg = jnp.float32(-1e9)
    mi = xy.shape[0]
    seg_onehot = (seg[None, :] == jnp.arange(num_seg)[:, None]) & mask[None, :]
    seg_valid = jnp.any(seg_onehot, axis=1)  # [B]

    def body(state, _):
        suppressed, chosen = state
        s1 = jnp.where(mask & ~suppressed & ~chosen, logits, neg)
        s2 = jnp.where(mask & ~chosen, logits, neg)
        m1 = jnp.where(seg_onehot, s1[None, :], neg)  # [B, MI]
        m2 = jnp.where(seg_onehot, s2[None, :], neg)
        i1 = jnp.argmax(m1, axis=1)
        i2 = jnp.argmax(m2, axis=1)
        has1 = jnp.max(m1, axis=1) > neg / 2
        pick = jnp.where(has1, i1, i2)  # [B]

        safe_pick = jnp.where(seg_valid, pick, mi)
        chosen = chosen.at[safe_pick].set(True, mode="drop")
        # Suppress nodes within threshold of their segment's new pick.
        picked_xy = jnp.take(xy, pick, axis=0)  # [B, 2]
        my_pick_xy = jnp.take(picked_xy, jnp.clip(seg, 0, num_seg - 1), axis=0)
        d = jnp.sqrt(jnp.sum(jnp.square(xy - my_pick_xy), axis=1))
        newly = (d < threshold) & jnp.take(seg_valid, jnp.clip(seg, 0, num_seg - 1))
        suppressed = suppressed | newly
        return (suppressed, chosen), pick

    init = (jnp.zeros(mi, bool), jnp.zeros(mi, bool))
    _, picks = jax.lax.scan(body, init, None, length=k)
    return picks.T  # [B, k]


def _quad_coefficients(agt_ctrs, agt_dirs, pred_ctrs, pred_dirs, k):
    """Quadratic curve x(s), y(s) through agent pose → goal pose
    (reference compute_coefficent lanercnn.py:710-723)."""
    ax = agt_ctrs[:, None, 0]
    ay = agt_ctrs[:, None, 1]
    adx = agt_dirs[:, None, 0]
    ady = agt_dirs[:, None, 1]
    a1 = (2 * pred_ctrs[:, :, 0] * adx + 2 * ax * adx) / (2 + adx - pred_dirs[:, :, 0])
    a0 = pred_ctrs[:, :, 0] - ax - a1
    a2 = jnp.repeat(ax, k, axis=1)
    b1 = (2 * pred_ctrs[:, :, 1] * ady + 2 * ay * ady) / (2 + ady - pred_dirs[:, :, 1])
    b0 = pred_ctrs[:, :, 1] - ay - b1
    b2 = jnp.repeat(ay, k, axis=1)
    return tuple(x[:, :, None] for x in (a0, a1, a2, b0, b1, b2))


def _sample_traj(s, a0, a1, a2, b0, b1, b2):
    x = a0 * s ** 2 + a1 * s + a2
    y = b0 * s ** 2 + b1 * s + b2
    return jnp.stack([x, y], axis=-1)


def _sample_d1_traj(s, a0, a1, a2, b0, b1, b2):
    x = 2 * a0 * s + a1
    y = 2 * b0 * s + b1
    return jnp.stack([x, y], axis=-1)


class Decode(nn.Module):
    """Anchor-based decoding (lanercnn.py:740-924)."""

    cfg: ModelConfig
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self, roi_feat: jax.Array, batch: RoiPackedBatch
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        k, t_pred = self.cfg.num_mods, self.cfg.num_preds
        b = batch.agt_ctrs.shape[0]
        t_hist = batch.agt_trajs.shape[1]

        int_feats = jnp.take(roi_feat, batch.int_node_idx, axis=0)  # [MI, C]
        h = Linear(self.cfg.n_actor, dtype=self.dtype, name="pred_hidden")(int_feats)
        pred = Dense(5, dtype=self.dtype, name="pred_out")(h)  # [MI, 5]

        anchors = jnp.take(batch.node_feats, batch.int_node_idx, axis=0)
        anc_ctrs = anchors[:, :2]
        anc_dirs = anchors[:, 2:4]
        anc_theta = jnp.arctan2(anc_dirs[:, 1], anc_dirs[:, 0])

        logits = pred[:, 0]
        pred_xy = anc_ctrs + pred[:, 1:3]
        # Reference computes arctan(p3/p4) on raw network outputs
        # (lanercnn.py:785-826); a sign-preserving epsilon on the denominator
        # keeps the same value everywhere |p4| > eps while making a 0-output
        # at init yield a finite angle instead of inf→NaN trajectories.
        denom = pred[:, 4]
        safe_denom = jnp.where(
            jnp.abs(denom) < 1e-6, jnp.where(denom < 0, -1e-6, 1e-6), denom
        )
        pred_theta = anc_theta + jnp.arctan(pred[:, 3] / safe_denom)

        sel = segmented_nms(
            pred_xy, logits, batch.int_node_scen, batch.int_node_mask, b, k
        )  # [B, k]
        pred_ctrs = jnp.take(pred_xy, sel, axis=0)  # [B, k, 2]
        pred_thetas = jnp.take(pred_theta, sel, axis=0)  # [B, k]
        pred_logits = jnp.take(logits, sel, axis=0)  # [B, k]
        pred_dirs = jnp.stack([jnp.cos(pred_thetas), jnp.sin(pred_thetas)], axis=-1)

        coef = _quad_coefficients(batch.agt_ctrs, batch.agt_dirs, pred_ctrs, pred_dirs, k)

        # Constant-acceleration arc-length reparameterization (lanercnn.py:851-865).
        s31 = (1.0 / t_pred) * jnp.arange(0, t_pred + 1, dtype=jnp.float32)
        trajs31 = _sample_traj(s31[None, None, :], *coef)  # [B, k, 31, 2]
        seg_d = trajs31[:, :, 1:] - trajs31[:, :, :-1]
        curve_len = jnp.sqrt((seg_d ** 2).sum(-1)).sum(-1)  # [B, k]
        accs = 2 * (curve_len - batch.agt_vels[:, None] * 3.0) / 9.0
        t31 = 0.1 * jnp.arange(0, t_pred + 1, dtype=jnp.float32)
        v = batch.agt_vels[:, None, None] + accs[:, :, None] * t31  # [B, k, 31]
        v = jnp.maximum(v, 0.0)
        s_abs = (v[:, :, 0:1] + v[:, :, 1:]) * t31[1:] / 2  # [B, k, 30]
        s_max = jnp.max(s_abs, axis=2, keepdims=True)
        s_norm = jnp.where(s_max > 0, s_abs / jnp.where(s_max == 0, 1.0, s_max), s_abs)
        s_norm = jnp.where(s_norm == 0.0, 1.0, s_norm)

        # Agent-motion-graph refinement (lanercnn.py:869-896).
        traj_pts = batch.agt_trajs.reshape(b * t_hist, 2)
        traj_dirs = batch.agt_traj_dirs.reshape(b * t_hist, 2)
        agt_emb = Dense(self.cfg.n_actor, dtype=self.dtype, name="agt1_dense")(traj_pts)
        agt_emb = Linear(self.cfg.n_actor, act=False, dtype=self.dtype, name="agt1_out")(
            nn.relu(agt_emb)
        )
        agt_emb2 = Dense(self.cfg.n_actor, dtype=self.dtype, name="agt2_dense")(traj_dirs)
        agt_emb2 = Linear(self.cfg.n_actor, act=False, dtype=self.dtype, name="agt2_out")(
            nn.relu(agt_emb2)
        )
        agt_feat = nn.relu(agt_emb + agt_emb2)  # [B*T, C]

        ctx_pose = jnp.concatenate([traj_pts, traj_dirs], axis=-1)
        tgt_pose = jnp.concatenate([anc_ctrs, anc_dirs], axis=-1)
        PoolD = nn.remat(LanePooling) if self.remat else LanePooling
        int_feats = PoolD(self.cfg.n_actor, dtype=self.dtype,
                          pallas_edge=self.cfg.pallas_edge, name="lane_pool")(
            agt_feat, ctx_pose, int_feats, tgt_pose, batch.a2r
        )

        traj_feats = jnp.take(int_feats, sel, axis=0)  # [B, k, C]
        rh = Linear(self.cfg.n_actor, dtype=self.dtype, name="refine_hidden")(
            traj_feats.reshape(b * k, -1)
        )
        delta = Dense(t_pred * 2, dtype=self.dtype, name="refine_out")(rh)
        delta = delta.reshape(b, k, t_pred, 2)

        # Longitudinal shift + renormalize (lanercnn.py:898-903).
        s_abs2 = s_abs + delta[:, :, :, 0]
        s_max2 = jnp.max(s_abs2, axis=2, keepdims=True)
        s_norm2 = jnp.where(s_max2 != 0, s_abs2 / jnp.where(s_max2 == 0, 1.0, s_max2), s_abs2)
        s_norm2 = jnp.where(s_norm2 == 0.0, 1.0, s_norm2)

        # Lateral shift along the rotated tangent (lanercnn.py:904-919).
        dxy = _sample_d1_traj(s_norm2, *coef)  # [B, k, 30, 2]
        norm_dxy = jnp.stack([-dxy[..., 1], dxy[..., 0]], axis=-1)
        shift = norm_dxy * delta[:, :, :, 1:2]
        trajs = _sample_traj(s_norm2, *coef) + shift  # [B, k, 30, 2]

        return pred_logits, pred_ctrs, trajs


class PredHead(nn.Module):
    """Standalone per-node 5-dim goal head (reference PredHead
    lanercnn.py:647-662; commented out of the reference Net — the active path
    folds the same Linear+Dense into Decode's pred_hidden/pred_out)."""

    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feat: jax.Array) -> jax.Array:
        h = Linear(self.cfg.n_actor, dtype=self.dtype, name="hidden")(roi_feat)
        return Dense(5, dtype=self.dtype, name="out")(h)  # [nodes, 5]


class RefineHead(nn.Module):
    """Standalone per-node 6x30x2 refinement head (reference RefineHead
    lanercnn.py:664-680; commented out of the reference Net)."""

    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feat: jax.Array) -> jax.Array:
        k, t = self.cfg.num_mods, self.cfg.num_preds
        h = Linear(self.cfg.n_actor, dtype=self.dtype, name="hidden")(roi_feat)
        out = Dense(k * t * 2, dtype=self.dtype, name="out")(h)
        return out.reshape(-1, k, t, 2)


class LaneRCNN(nn.Module):
    cfg: ModelConfig
    dtype: Any = jnp.float32
    # Rematerialize the three LanePooling stages in the backward pass: their
    # per-edge [E, C] intermediates dominate HBM at large pool-edge
    # capacities; remat trades one extra pooling forward for not storing
    # them, roughly doubling the RoI-pack size that fits on a chip.
    remat: bool = False

    @nn.compact
    def __call__(self, batch: RoiPackedBatch) -> Dict[str, jax.Array]:
        roi_plan = None
        if batch.plan_lu is not None:
            roi_plan = (batch.plan_lu, batch.plan_lv, batch.plan_rel, batch.plan_scen)
        feat = LaneInput(self.cfg, dtype=self.dtype, name="input")(batch)
        feat = LaneRoI(self.cfg, dtype=self.dtype, name="roi_net1")(
            feat, batch.edges, batch.bands, batch.tables, batch.table_inv,
            plan=roi_plan,
        )
        feat = Interactor(
            self.cfg, dtype=self.dtype, remat=self.remat, name="interactor"
        )(batch, feat)
        feat = LaneRoI(self.cfg, dtype=self.dtype, name="roi_net2")(
            feat, batch.edges, batch.bands, batch.tables, batch.table_inv,
            plan=roi_plan,
        )
        logits, goals, trajs = Decode(
            self.cfg, dtype=self.dtype, remat=self.remat, name="decode"
        )(feat, batch)
        return {
            "pred_logics": logits.astype(jnp.float32),
            "pred_goals": goals.astype(jnp.float32),
            "pred_trajs": trajs.astype(jnp.float32),
        }


def roi_loss(out: Dict, batch: RoiPackedBatch, cfg: LossConfig) -> Dict[str, jax.Array]:
    """BCE mode classification + SmoothL1 goal/trajectory regression
    (reference RoiLoss lanercnn.py:1205-1301), masked for padding scenarios."""
    logits = out["pred_logics"]  # [B, K]
    goals = out["pred_goals"]  # [B, K, 2]
    trajs = out["pred_trajs"]  # [B, K, T, 2]
    gt = batch.gt_preds  # [B, T, 2] agent frame
    has = batch.has_preds  # [B, T]
    valid = batch.scen_mask
    b, k, t = trajs.shape[0], trajs.shape[1], trajs.shape[2]

    last = has.astype(jnp.float32) + 0.1 * jnp.arange(t, dtype=jnp.float32) / float(t)
    last_idcs = jnp.argmax(last, axis=1)  # [B]
    gt_last = jnp.take_along_axis(gt, last_idcs[:, None, None], axis=1)[:, 0]  # [B, 2]

    dist = jnp.sqrt(jnp.sum(jnp.square(goals - gt_last[:, None, :]), axis=-1))  # [B, K]
    min_idcs = jnp.argmin(dist, axis=1)

    # BCE-with-logits against the min-goal-dist one-hot (lanercnn.py:1260-1270).
    onehot = jax.nn.one_hot(min_idcs, k)
    bce = jnp.maximum(logits, 0) - logits * onehot + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    cls_loss = jnp.sum(jnp.where(valid[:, None], bce, 0.0))
    num_cls = jnp.sum(valid.astype(jnp.float32))

    # Goal regression on the best mode (lanercnn.py:1273-1284).
    has_goal = jnp.take_along_axis(has, last_idcs[:, None], axis=1)[:, 0] & valid
    goal_best = jnp.take_along_axis(goals, min_idcs[:, None, None], axis=1)[:, 0]
    goal_err = smooth_l1(goal_best - gt_last)
    reg_goal = cfg.reg_coef * jnp.sum(jnp.where(has_goal[:, None], goal_err, 0.0))
    num_goal = jnp.sum(has_goal.astype(jnp.float32))

    # Trajectory regression on the best mode (lanercnn.py:1286-1294).
    traj_best = jnp.take_along_axis(trajs, min_idcs[:, None, None, None], axis=1)[:, 0]
    traj_mask = has & valid[:, None]
    traj_err = smooth_l1(traj_best - gt)
    reg_traj = cfg.reg_coef * jnp.sum(jnp.where(traj_mask[:, :, None], traj_err, 0.0))
    num_traj = jnp.sum(traj_mask.astype(jnp.float32))

    loss = (
        cls_loss / (num_cls + 1e-10)
        + reg_goal / (num_goal + 1e-10)
        + reg_traj / (num_traj + 1e-10)
    )
    return {
        "loss": loss,
        "cls_loss": cls_loss,
        "num_cls": num_cls,
        "reg_loss": reg_goal + reg_traj,
        "num_reg": num_goal + num_traj,
        "reg_goal_loss": reg_goal,
        "num_reg_goal": num_goal,
        "reg_traj_loss": reg_traj,
        "num_reg_traj": num_traj,
    }


def roi_loss_for_goals(
    out: Dict, batch: RoiPackedBatch, cfg: LossConfig
) -> Dict[str, jax.Array]:
    """Goal-only loss variant (reference RoiLossForGoals lanercnn.py:926-1202,
    superseded by RoiLoss in the active path): BCE-with-logits on the 6 modes
    against the min-goal-distance one-hot + SmoothL1 on the best mode's goal
    point — no trajectory term. Masked for padding scenarios."""
    logits = out["pred_logics"]  # [B, K]
    goals = out["pred_goals"]  # [B, K, 2]
    gt = batch.gt_preds  # [B, T, 2] agent frame
    has = batch.has_preds  # [B, T]
    valid = batch.scen_mask
    t = gt.shape[1]
    k = logits.shape[1]

    last = has.astype(jnp.float32) + 0.1 * jnp.arange(t, dtype=jnp.float32) / float(t)
    last_idcs = jnp.argmax(last, axis=1)  # [B]
    gt_last = jnp.take_along_axis(gt, last_idcs[:, None, None], axis=1)[:, 0]  # [B, 2]

    dist = jnp.sqrt(jnp.sum(jnp.square(goals - gt_last[:, None, :]), axis=-1))
    min_idcs = jnp.argmin(dist, axis=1)

    onehot = jax.nn.one_hot(min_idcs, k)
    bce = jnp.maximum(logits, 0) - logits * onehot + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    cls_loss = jnp.sum(jnp.where(valid[:, None], bce, 0.0))
    num_cls = jnp.sum(valid.astype(jnp.float32))

    has_goal = jnp.take_along_axis(has, last_idcs[:, None], axis=1)[:, 0] & valid
    goal_best = jnp.take_along_axis(goals, min_idcs[:, None, None], axis=1)[:, 0]
    goal_err = smooth_l1(goal_best - gt_last)
    reg_loss = cfg.reg_coef * jnp.sum(jnp.where(has_goal[:, None], goal_err, 0.0))
    num_reg = jnp.sum(has_goal.astype(jnp.float32))

    loss = cls_loss / (num_cls + 1e-10) + reg_loss / (num_reg + 1e-10)
    return {
        "loss": loss,
        "cls_loss": cls_loss,
        "num_cls": num_cls,
        "reg_loss": reg_loss,
        "num_reg": num_reg,
        "goals_to_eval": goal_best,
    }


def roi_metrics(out: Dict, batch: RoiPackedBatch) -> Dict[str, jax.Array]:
    """ADE/FDE sums on the focal agent (agent frame — displacement metrics are
    rotation-invariant, reference lanercnn.py:1408-1463)."""
    trajs = out["pred_trajs"]  # [B, K, T, 2]
    gt = batch.gt_preds
    valid = batch.scen_mask.astype(jnp.float32)
    err = jnp.sqrt(jnp.sum(jnp.square(trajs - gt[:, None, :, :]), axis=3))  # [B, K, T]
    ade1 = jnp.sum(jnp.mean(err[:, 0, :], axis=1) * valid)
    fde1 = jnp.sum(err[:, 0, -1] * valid)
    min_idcs = jnp.argmin(err[:, :, -1], axis=1)
    err_best = jnp.take_along_axis(err, min_idcs[:, None, None], axis=1)[:, 0]
    ade = jnp.sum(jnp.mean(err_best, axis=1) * valid)
    fde = jnp.sum(err_best[:, -1] * valid)
    mr = jnp.sum((err_best[:, -1] > 2.0).astype(jnp.float32) * valid)
    return {
        "ade1_sum": ade1,
        "fde1_sum": fde1,
        "ade_sum": ade,
        "fde_sum": fde,
        "mr_sum": mr,
        "num_scen": jnp.sum(valid),
    }
