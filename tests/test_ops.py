"""Unit tests for primitive ops: scatter/gather vs dense reference, and
torch-parity of group_norm / conv1d / interpolate (torch CPU is available)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from lanegcn_tpu.ops import conv1d, group_norm, interpolate_linear, masked_gather, scatter_add


def test_scatter_add_matches_dense():
    rng = np.random.default_rng(0)
    n, e, c = 50, 200, 16
    data = rng.normal(size=(e, c)).astype(np.float32)
    idx = rng.integers(0, n, size=e).astype(np.int32)
    mask = rng.random(e) < 0.7

    out = scatter_add(jnp.array(data), jnp.array(idx), n, mask=jnp.array(mask))
    expect = np.zeros((n, c), np.float32)
    for i in range(e):
        if mask[i]:
            expect[idx[i]] += data[i]
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)


def test_scatter_add_accumulates_into_out():
    base = jnp.ones((4, 3))
    data = jnp.full((2, 3), 2.0)
    idx = jnp.array([1, 1], jnp.int32)
    out = scatter_add(data, idx, 4, out=base)
    np.testing.assert_allclose(np.asarray(out)[1], [5.0, 5.0, 5.0])
    np.testing.assert_allclose(np.asarray(out)[0], [1.0, 1.0, 1.0])


def test_masked_gather_zeros_invalid_rows():
    x = jnp.arange(12.0).reshape(4, 3)
    idx = jnp.array([2, 0, 99], jnp.int32)  # 99 out of range → clamped but masked
    mask = jnp.array([True, True, False])
    out = masked_gather(x, idx, mask)
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(x)[2])
    np.testing.assert_allclose(np.asarray(out)[2], 0.0)


@pytest.mark.parametrize("shape", [(7, 128), (5, 20, 32)])
@pytest.mark.parametrize("groups", [1, 4])
def test_group_norm_torch_parity(shape, groups):
    rng = np.random.default_rng(1)
    x = rng.normal(size=shape).astype(np.float32) * 3 + 1
    c = shape[-1]
    w = rng.normal(size=c).astype(np.float32)
    b = rng.normal(size=c).astype(np.float32)

    ours = group_norm(jnp.array(x), jnp.array(w), jnp.array(b), groups)

    # torch GroupNorm wants channels-first.
    xt = torch.from_numpy(x)
    if x.ndim == 3:
        xt = xt.transpose(1, 2)
    gn = torch.nn.GroupNorm(groups, c)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(w))
        gn.bias.copy_(torch.from_numpy(b))
    ref = gn(xt).detach()
    if x.ndim == 3:
        ref = ref.transpose(1, 2)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("stride,k", [(1, 3), (2, 3), (1, 1), (2, 1)])
def test_conv1d_torch_parity(stride, k):
    rng = np.random.default_rng(2)
    n, l, cin, cout = 4, 20, 8, 16
    x = rng.normal(size=(n, l, cin)).astype(np.float32)
    w = rng.normal(size=(k, cin, cout)).astype(np.float32)

    ours = conv1d(jnp.array(x), jnp.array(w), stride)

    xt = torch.from_numpy(x).transpose(1, 2)  # [N, C, L]
    wt = torch.from_numpy(w).permute(2, 1, 0)  # [Cout, Cin, K]
    ref = F.conv1d(xt, wt, stride=stride, padding=(k - 1) // 2).transpose(1, 2)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("l_in,l_out", [(5, 10), (10, 20), (7, 14)])
def test_interpolate_linear_torch_parity(l_in, l_out):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(3, l_in, 6)).astype(np.float32)
    ours = interpolate_linear(jnp.array(x), l_out)
    xt = torch.from_numpy(x).transpose(1, 2)
    ref = F.interpolate(xt, scale_factor=l_out / l_in, mode="linear", align_corners=False)
    ref = ref.transpose(1, 2)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5, atol=1e-5)


def test_scatter_add_deterministic():
    # Duplicate destinations must accumulate deterministically.
    data = jnp.ones((1000, 4))
    idx = jnp.zeros(1000, jnp.int32)
    out1 = scatter_add(data, idx, 8)
    out2 = scatter_add(data, idx, 8)
    assert np.array_equal(np.asarray(out1), np.asarray(out2))
    np.testing.assert_allclose(np.asarray(out1)[0], 1000.0)


def test_sorted_transpose_gather_matches_masked_gather_grad():
    """The sorted-transpose VJP (permute + sorted scatter) must equal the
    autodiff of the plain masked gather."""
    import jax
    import jax.numpy as jnp

    from lanegcn_tpu.ops import masked_gather
    from lanegcn_tpu.ops.table_gather import sorted_transpose_gather

    rng = np.random.default_rng(7)
    s, e, c = 64, 200, 16
    x = jnp.asarray(rng.normal(size=(s, c)).astype(np.float32))
    idx = rng.integers(0, s, e).astype(np.int32)
    mask = np.ones(e, bool)
    mask[150:] = False
    order = np.argsort(np.where(mask, idx, s), kind="stable")
    idx, mask = idx[order], mask[order]  # edges destination-ish sorted
    n_valid = int(mask.sum())
    inv_perm = np.full(e, e - 1, np.int32)
    inv_dst = np.full(e, s, np.int32)
    o2 = np.argsort(idx[:n_valid], kind="stable").astype(np.int32)
    inv_perm[:n_valid] = o2
    inv_dst[:n_valid] = idx[:n_valid][o2]

    args = (jnp.asarray(idx), jnp.asarray(mask), jnp.asarray(inv_perm), jnp.asarray(inv_dst))

    out_s = sorted_transpose_gather(x, *args)
    out_m = masked_gather(x, args[0], args[1])
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_m), rtol=0, atol=0)

    w = jnp.asarray(rng.normal(size=(e, c)).astype(np.float32))
    g_s = jax.grad(lambda xx: jnp.sum(sorted_transpose_gather(xx, *args) * w))(x)
    g_m = jax.grad(lambda xx: jnp.sum(masked_gather(xx, args[0], args[1]) * w))(x)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_m), rtol=1e-6, atol=1e-6)


def test_sorted_transpose_gather_zero_masked_equivalence():
    """zero_masked=False (no [E, C] padding select) must give identical
    outputs AND gradients when the gathered rows feed a masked destination
    scatter — the LanePooling pool-edge pattern (models/lanercnn.py)."""
    import numpy as np

    from lanegcn_tpu.ops.scatter import scatter_add
    from lanegcn_tpu.ops.table_gather import sorted_transpose_gather

    rng = np.random.RandomState(0)
    S, E, N, C = 12, 32, 10, 8
    x = jnp.asarray(rng.randn(S, C), jnp.float32)
    w = jnp.asarray(rng.randn(C, C), jnp.float32)
    idx = np.zeros(E, np.int32)
    mask = np.zeros(E, bool)
    u = np.zeros(E, np.int32)
    nv = 20
    idx[:nv] = rng.randint(0, S, nv)
    u[:nv] = np.sort(rng.randint(0, N, nv))
    mask[:nv] = True
    inv_perm = np.full(E, E - 1, np.int32)
    inv_dst = np.full(E, S, np.int32)
    o2 = np.argsort(idx[:nv], kind="stable").astype(np.int32)
    inv_perm[:nv] = o2
    inv_dst[:nv] = idx[:nv][o2]
    idx_j, mask_j = jnp.asarray(idx), jnp.asarray(mask)
    inv_perm_j, inv_dst_j = jnp.asarray(inv_perm), jnp.asarray(inv_dst)
    u_j = jnp.asarray(u)

    def run(zero_masked):
        def f(x, w):
            g = sorted_transpose_gather(
                x, idx_j, mask_j, inv_perm_j, inv_dst_j, zero_masked=zero_masked
            )
            msg = jnp.tanh(g @ w)  # row-local chain stand-in
            out = scatter_add(msg, u_j, N, mask=mask_j)
            return jnp.sum(out ** 2), out

        (loss, out), grads = jax.value_and_grad(
            lambda *a: f(*a), argnums=(0, 1), has_aux=True
        )(x, w)
        return loss, out, grads

    l1, o1, g1 = run(True)
    l2, o2_, g2 = run(False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2_), rtol=1e-6)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
