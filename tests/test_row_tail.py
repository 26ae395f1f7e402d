"""Parity of the fused residual-tail kernel (ops/pallas_row_tail) against
the unfused XLA formulation used by the Att stages (models/fusion.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanegcn_tpu.ops.pallas_row_tail import (
    fused_row_tail,
    fused_row_tail2,
    xla_reference,
    xla_reference2,
)


def _inputs(n, c, dtype, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    x = jax.random.normal(ks[0], (n, c), dtype)
    res = jax.random.normal(ks[1], (n, c), dtype) * 0.5
    w = jax.random.normal(ks[2], (c, c), jnp.float32) * (1.0 / np.sqrt(c))
    g1w = 1.0 + 0.1 * jax.random.normal(ks[3], (c,), jnp.float32)
    g1b = 0.1 * jax.random.normal(ks[4], (c,), jnp.float32)
    g2w = 1.0 + 0.1 * jax.random.normal(ks[5], (c,), jnp.float32)
    g2b = 0.1 * jax.random.normal(ks[6], (c,), jnp.float32)
    return x, res, w, g1w, g1b, g2w, g2b


@pytest.mark.parametrize("n", [256, 384, 1024, 1280])
def test_forward_parity(n):
    args = _inputs(n, 128, jnp.float32, seed=n)
    got = fused_row_tail(*args, mode="interpret")
    want = xla_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_forward_parity_bf16():
    args = _inputs(512, 128, jnp.bfloat16, seed=3)
    got = fused_row_tail(*args, mode="interpret").astype(jnp.float32)
    want = xla_reference(*args).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("n", [256, 384])
def test_gradient_parity(n):
    args = _inputs(n, 128, jnp.float32, seed=10 + n)
    cot = jax.random.normal(jax.random.PRNGKey(99), (n, 128), jnp.float32)

    def loss_fused(*a):
        return jnp.vdot(fused_row_tail(*a, mode="interpret"), cot)

    def loss_ref(*a):
        return jnp.vdot(xla_reference(*a), cot)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    names = ["x", "res", "w", "g1w", "g1b", "g2w", "g2b"]
    for name, a, b in zip(names, g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_gradient_parity_bf16():
    # Pins the bf16 backward path (the --bf16 production config routes
    # every Att/LanePooling tail through the hand-written VJP with the
    # packed w in bf16): loose tolerance, and the dw cotangent must come
    # back in the packed primal's dtype without tripping custom_vjp
    # dtype checks.
    args = _inputs(512, 128, jnp.bfloat16, seed=17)
    cot = jax.random.normal(jax.random.PRNGKey(55), (512, 128), jnp.float32)

    def loss_fused(*a):
        return jnp.vdot(fused_row_tail(*a, mode="interpret").astype(jnp.float32), cot)

    def loss_ref(*a):
        return jnp.vdot(xla_reference(*a).astype(jnp.float32), cot)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    names = ["x", "res", "w", "g1w", "g1b", "g2w", "g2b"]
    for name, a, b in zip(names, g_fused, g_ref):
        assert a.dtype == b.dtype, f"grad dtype mismatch for {name}"
        a = np.asarray(a, dtype=np.float32)
        b = np.asarray(b, dtype=np.float32)
        scale = max(1.0, float(np.max(np.abs(b))))
        # bf16 rounding can flip relu masks for near-zero pre-activations,
        # so isolated elements may disagree; require the bulk to match and
        # the aggregate error to be small.
        bad = np.abs(a - b) / scale > 6e-2
        assert bad.mean() < 1e-3, (
            f"grad mismatch for {name}: {bad.sum()}/{bad.size} elements off"
        )
        rel_l2 = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-6)
        assert rel_l2 < 6e-2, f"grad L2 mismatch for {name}: {rel_l2}"


def _inputs2(n, c, dtype, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 10)
    x = jax.random.normal(ks[0], (n, c), dtype)
    res = jax.random.normal(ks[1], (n, c), dtype) * 0.5
    w1 = jax.random.normal(ks[2], (c, c), jnp.float32) * (1.0 / np.sqrt(c))
    w2 = jax.random.normal(ks[3], (c, c), jnp.float32) * (1.0 / np.sqrt(c))
    affs = []
    for i in range(3):
        affs.append(1.0 + 0.1 * jax.random.normal(ks[4 + 2 * i], (c,), jnp.float32))
        affs.append(0.1 * jax.random.normal(ks[5 + 2 * i], (c,), jnp.float32))
    return (x, res, w1, w2, *affs)


@pytest.mark.parametrize("n", [256, 384])
def test_forward_parity_two_linear(n):
    args = _inputs2(n, 128, jnp.float32, seed=n)
    got = fused_row_tail2(*args, mode="interpret")
    want = xla_reference2(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradient_parity_two_linear():
    args = _inputs2(256, 128, jnp.float32, seed=21)
    cot = jax.random.normal(jax.random.PRNGKey(77), (256, 128), jnp.float32)

    def loss_fused(*a):
        return jnp.vdot(fused_row_tail2(*a, mode="interpret"), cot)

    def loss_ref(*a):
        return jnp.vdot(xla_reference2(*a), cot)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
    names = ["x", "res", "w1", "w2", "g1w", "g1b", "g2w", "g2b", "g3w", "g3b"]
    for name, a, b in zip(names, g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_res_cotangent_is_masked_upstream():
    # dres must be the upstream cotangent masked by the output relu —
    # exactly zero where out == 0.
    args = _inputs(256, 128, jnp.float32, seed=7)
    out = fused_row_tail(*args, mode="interpret")
    g = jax.grad(
        lambda *a: jnp.sum(fused_row_tail(*a, mode="interpret")), argnums=1
    )(*args)
    assert np.all((np.asarray(out) > 0) == (np.asarray(g) != 0))
