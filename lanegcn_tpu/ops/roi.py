"""BEV raster feature sampling: bilinear pixel and rotated-ROI extraction.

JAX counterparts of the reference's legacy raster path (reference
layers.py:249-353 — linear_interp, get_pixel_feat, get_roi_feat), kept for
the raster model family surface. Channels-last feature maps [H, W, C].
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def linear_interp(x: jax.Array, n_max: int) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Normalized positions [0,1] → (left weight, left idx, right weight,
    right idx) for center-aligned pixels (reference layers.py:249-274)."""
    x = x * n_max - 0.5
    x = jnp.clip(x, 0.0, n_max - 1)
    n = jnp.floor(x)
    rw = x - n
    lw = 1.0 - rw
    li = n.astype(jnp.int32)
    ri = jnp.minimum(li + 1, n_max - 1)
    return lw, li, rw, ri


def get_pixel_feat(
    fm: jax.Array,  # [H, W, C]
    points: jax.Array,  # [N, 2] world xy
    pts_range: Sequence[float],  # (x_min, x_max, y_min, y_max)
) -> jax.Array:
    """Bilinear feature sampling at world points (reference layers.py:277-291)."""
    x_min, x_max, y_min, y_max = pts_range[:4]
    h, w = fm.shape[0], fm.shape[1]
    x = (points[:, 0] - x_min) / (x_max - x_min)
    y = (y_max - points[:, 1]) / (y_max - y_min)

    xlw, xli, xhw, xhi = linear_interp(x, w)
    ylw, yli, yhw, yhi = linear_interp(y, h)
    return (
        (xlw * ylw)[:, None] * fm[yli, xli]
        + (xlw * yhw)[:, None] * fm[yhi, xli]
        + (xhw * ylw)[:, None] * fm[yli, xhi]
        + (xhw * yhw)[:, None] * fm[yhi, xhi]
    )


def get_roi_feat(
    fm: jax.Array,  # [H, W, C]
    bboxes: jax.Array,  # [N, 5] (cx, cy, wid, hgt, theta)
    roi_size: int | Tuple[int, int],
    pts_range: Sequence[float],
) -> jax.Array:
    """Rotated-box ROI feature extraction (reference layers.py:294-353).

    Returns [N, roi_h, roi_w, C]; out-of-range bins are zero.
    """
    if isinstance(roi_size, int):
        roi_size = (roi_size, roi_size)
    roi_h, roi_w = roi_size
    n = bboxes.shape[0]
    cx, cy, wid, hgt, theta = (bboxes[:, i] for i in range(5))
    ct, st = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.stack(
        [jnp.stack([ct, -st], -1), jnp.stack([st, ct], -1)], axis=1
    )  # [N, 2, 2]

    x_bin = (jnp.arange(roi_w) + 0.5) / roi_w - 0.5  # [W]
    y_bin = (jnp.arange(roi_h - 1, -1, -1) + 0.5) / roi_h - 0.5  # [H], top-down
    offset = jnp.stack(
        [
            jnp.broadcast_to(x_bin[None, None, :], (n, roi_h, roi_w)) * wid[:, None, None],
            jnp.broadcast_to(y_bin[None, :, None], (n, roi_h, roi_w)) * hgt[:, None, None],
        ],
        axis=-1,
    )  # [N, H, W, 2]
    offset = jnp.einsum("nij,nhwj->nhwi", rot, offset)
    pts = offset + jnp.stack([cx, cy], -1)[:, None, None, :]

    x_min, x_max, y_min, y_max = pts_range[:4]
    xs = (pts[..., 0].reshape(-1) - x_min) / (x_max - x_min)
    ys = (y_max - pts[..., 1].reshape(-1)) / (y_max - y_min)
    valid = (xs > 0) & (xs < 1) & (ys > 0) & (ys < 1)

    h, w = fm.shape[0], fm.shape[1]
    xlw, xli, xhw, xhi = linear_interp(xs, w)
    ylw, yli, yhw, yhi = linear_interp(ys, h)
    feat = (
        (xlw * ylw)[:, None] * fm[yli, xli]
        + (xlw * yhw)[:, None] * fm[yhi, xli]
        + (xhw * ylw)[:, None] * fm[yli, xhi]
        + (xhw * yhw)[:, None] * fm[yhi, xhi]
    )
    feat = jnp.where(valid[:, None], feat, 0.0)
    return feat.reshape(n, roi_h, roi_w, fm.shape[-1])
