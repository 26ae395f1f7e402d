"""Window-slotted pool-edge scatter (ops/pallas_window_scatter +
data/packing.py window_chunked_edges): kernel parity in interpret mode
against the XLA reference, gradient parity of the hand-written VJP, packer
chunk-alignment invariants, and equivalence of the whole layout against a
plain masked scatter_add."""

import jax
import jax.numpy as jnp
import numpy as np

from lanegcn_tpu.data.packing import window_chunked_edges
from lanegcn_tpu.ops.pallas_window_scatter import (
    _WCHUNK,
    window_scatter_add,
    xla_reference,
)

STRIDE, C = 128, 128
NWIN = 4
N = NWIN * STRIDE
CAP = 4 * _WCHUNK


def _random_edges(seed=0, n_edges=900, num_src=333):
    rng = np.random.RandomState(seed)
    u = rng.randint(0, N, n_edges)
    v = rng.randint(0, num_src, n_edges)
    return u, v


def _case(seed=0, n_edges=900, dtype=jnp.float32):
    rng = np.random.RandomState(seed + 100)
    u, v = _random_edges(seed, n_edges)
    es, dropped = window_chunked_edges(u, v, CAP, STRIDE, 333)
    assert dropped == 0
    msg = jnp.asarray(rng.randn(CAP, C) * 0.1, dtype)
    temp = jnp.asarray(rng.randn(N, C) * 0.1, dtype)
    return es, msg, temp, u, v


def test_packer_invariants():
    es, msg, temp, u, v = _case(0)
    lu = np.asarray(es.win_lu)[:, 0]
    wc = np.asarray(es.win_chunk)
    first = np.asarray(es.win_first)
    mask = np.asarray(es.mask)
    # Valid rows reconstruct the original multiset of (u, v) pairs.
    got_u = wc.repeat(_WCHUNK)[mask] * STRIDE + lu[mask]
    assert sorted(zip(got_u.tolist(), np.asarray(es.v)[mask].tolist())) == sorted(
        zip(u.tolist(), v.tolist())
    )
    # No chunk straddles two windows; same-window chunks are consecutive;
    # first flags mark exactly the window starts.
    assert np.all(lu[~mask] == -1)
    assert np.all((lu[mask] >= 0) & (lu[mask] < STRIDE))
    per_chunk_u = lu.reshape(-1, _WCHUNK)
    per_chunk_m = mask.reshape(-1, _WCHUNK)
    for i in range(len(wc)):
        rows = per_chunk_u[i][per_chunk_m[i]]
        assert rows.size == 0 or np.all(rows // STRIDE == 0)
    changes = np.nonzero(np.diff(wc))[0] + 1
    starts = set(changes.tolist()) | {0}
    # every flagged chunk is a window start; tail repeats have first == 0
    flagged = set(np.nonzero(first)[0].tolist())
    assert flagged <= starts
    # ...and the other direction: the first chunk of every occupied
    # window run MUST be flagged, or the kernel would accumulate into a
    # stale VMEM block (ADVICE r3: one-directional check missed this).
    occupied_starts = {
        i for i in starts if per_chunk_m[i].any()
    }
    assert occupied_starts <= flagged, (
        sorted(occupied_starts - flagged), "unflagged occupied window starts"
    )


def test_xla_reference_matches_plain_scatter():
    es, msg, temp, u, v = _case(1)
    out = xla_reference(msg, temp, es.win_lu, es.win_chunk, es.win_first, STRIDE)
    ref = jnp.zeros((N, C), jnp.float32)
    dst = np.where(np.asarray(es.mask), np.asarray(es.u), N)
    ref = ref.at[dst].add(
        jnp.where(jnp.asarray(np.asarray(es.mask))[:, None], msg, 0), mode="drop"
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(temp + ref.astype(temp.dtype)), rtol=1e-5,
        atol=1e-5,
    )


def test_forward_parity_interpret_vs_xla():
    es, msg, temp, *_ = _case(2)
    out_k = window_scatter_add(
        msg, temp, es.win_lu, es.win_chunk, es.win_first, STRIDE, mode="interpret"
    )
    out_x = window_scatter_add(
        msg, temp, es.win_lu, es.win_chunk, es.win_first, STRIDE, mode="xla"
    )
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_x), rtol=1e-5, atol=1e-5
    )


def test_forward_empty():
    es, msg, temp, *_ = _case(3)
    lu = jnp.full_like(es.win_lu, -1)
    first = jnp.zeros_like(es.win_first).at[0].set(1)
    wc = jnp.zeros_like(es.win_chunk)
    out = window_scatter_add(msg, temp, lu, wc, first, STRIDE, mode="interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(temp), atol=1e-6)


def test_grad_parity():
    es, msg, temp, *_ = _case(4)

    def loss(mode):
        def f(m, t):
            out = window_scatter_add(
                m, t, es.win_lu, es.win_chunk, es.win_first, STRIDE, mode=mode
            )
            return jnp.sum(out * jnp.cos(jnp.arange(C, dtype=jnp.float32)))

        return jax.grad(f, argnums=(0, 1))(msg, temp)

    gm_k, gt_k = loss("interpret")
    gm_x, gt_x = loss("xla")
    np.testing.assert_allclose(np.asarray(gm_k), np.asarray(gm_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gt_k), np.asarray(gt_x), rtol=1e-5, atol=1e-5)


def test_capacity_overflow_drops_tail():
    # 5 windows of edges into a 2-chunk capacity: later windows drop.
    u = np.concatenate([np.full(700, w * STRIDE) for w in range(NWIN)])
    v = np.arange(len(u)) % 50
    es, dropped = window_chunked_edges(u, v, 2 * _WCHUNK, STRIDE, 50)
    assert dropped == len(u) - int(np.asarray(es.mask).sum())
    assert int(np.asarray(es.mask).sum()) <= 2 * _WCHUNK
    # still well-formed: valid rows map inside their chunk's window
    lu = np.asarray(es.win_lu)[:, 0]
    mask = np.asarray(es.mask)
    wc = np.asarray(es.win_chunk).repeat(_WCHUNK)
    assert np.all(np.asarray(es.u)[mask] == wc[mask] * STRIDE + lu[mask])
