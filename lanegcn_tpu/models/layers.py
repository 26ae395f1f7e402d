"""Primitive NN blocks with torch-parity semantics (reference layers.py).

Conventions carried over from the reference so that checkpoints / training
recipes transfer:
- matmul/conv layers feeding a norm are bias-free (reference layers.py:45,70),
- every block normalizes with GroupNorm(gcd(ng, C), C), ng=1 in practice,
- residual blocks place ReLU after the residual add (layers.py:177-190,225-238),
- initializers follow torch defaults: U(±1/sqrt(fan_in)) for dense/conv
  weights and biases, ones/zeros for norm affine.

Layout is channels-last ([N, C] / [N, L, C]) — TPU-native — while the math
matches torch's channels-first modules exactly (verified in
tests/test_torch_parity.py).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from lanegcn_tpu.ops import conv1d, group_norm


def torch_uniform_init(fan_in: int):
    """torch's default kaiming_uniform(a=sqrt(5)) reduces to U(±1/sqrt(fan_in))."""

    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Dense(nn.Module):
    """Bare matmul layer (torch nn.Linear), channels-last."""

    n_out: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n_in = x.shape[-1]
        kernel = self.param("kernel", torch_uniform_init(n_in), (n_in, self.n_out))
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", torch_uniform_init(n_in), (self.n_out,))
            y = y + bias.astype(self.dtype)
        return y


class GroupNorm(nn.Module):
    """GroupNorm(gcd(ng, C), C) with per-channel affine (reference layers.py:23)."""

    ng: int = 1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        groups = math.gcd(self.ng, c)
        weight = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        # Normalization statistics in fp32 for bf16 activations.
        y = group_norm(x.astype(jnp.float32), weight, bias, groups, self.eps)
        return y.astype(x.dtype)


class Linear(nn.Module):
    """Linear(bias=False) + GN + optional ReLU (reference layers.py:65-87)."""

    n_out: int
    ng: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = Dense(self.n_out, use_bias=False, dtype=self.dtype, name="linear")(x)
        y = GroupNorm(self.ng, name="norm")(y)
        if self.act:
            y = nn.relu(y)
        return y


class _BareKernel(nn.Module):
    """Holds a Linear-compatible kernel param without applying it."""

    n_in: int
    n_out: int

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param("kernel", torch_uniform_init(self.n_in), (self.n_in, self.n_out))


class _BareGN(nn.Module):
    """Holds GroupNorm affine params (same names/init as GroupNorm)."""

    c: int

    @nn.compact
    def __call__(self):
        weight = self.param("weight", nn.initializers.ones, (self.c,))
        bias = self.param("bias", nn.initializers.zeros, (self.c,))
        return weight, bias


class DenseParams(nn.Module):
    """Raw params of a `Dense` (identical names/shapes/inits) for fused
    kernels that apply the matmul inline. Checkpoint-compatible with the
    unfused path."""

    n_in: int
    n_out: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_uniform_init(self.n_in), (self.n_in, self.n_out))
        bias = (
            self.param("bias", torch_uniform_init(self.n_in), (self.n_out,))
            if self.use_bias else None
        )
        return kernel, bias


class LinearParams(nn.Module):
    """Raw params of a `Linear`/`SplitLinear` (same layout: linear/kernel +
    norm/{weight,bias}) for fused kernels. Checkpoint-compatible."""

    n_in: int
    n_out: int

    @nn.compact
    def __call__(self):
        k = _BareKernel(self.n_in, self.n_out, name="linear")()
        w, b = _BareGN(self.n_out, name="norm")()
        return k, w, b


class SplitLinear(nn.Module):
    """`Linear` over a virtual concatenation, evaluated as a sum of
    per-segment matmuls so the [E, sum(widths)] concat never materializes.

    Parameter tree is identical to `Linear(n_out)` applied to the
    concatenation (`linear/kernel` of shape [sum(widths), n_out], `norm/*`),
    so checkpoints and parity harnesses are unaffected.

    Each part is `(x, gather_fn)`: x is matmul'd against its kernel slice
    first, then `gather_fn` (if given) maps the product rows onto the output
    rows (e.g. an edge gather). Because the blocks feeding a norm are
    bias-free, projecting dense per-row segments BEFORE the edge gather is
    exact — and moves that segment's matmul from edge count E down to row
    count (the classic SDDMM factorization).

    Exactness is up to floating-point summation order: bit-identical to the
    fused concat matmul in fp32, but in bf16 the per-segment matmul-then-add
    rounds differently than one matmul over the concatenation."""

    n_out: int
    widths: tuple
    ng: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, parts) -> jax.Array:
        assert len(parts) == len(self.widths)
        n_in = sum(self.widths)
        kernel = _BareKernel(n_in, self.n_out, name="linear")()
        off = 0
        z = None
        for i, ((x, gather_fn), w) in enumerate(zip(parts, self.widths)):
            assert x.shape[-1] == w, (
                f"SplitLinear part {i}: feature dim {x.shape[-1]} != declared width {w}"
            )
            piece = jnp.dot(
                x.astype(self.dtype), kernel[off : off + w].astype(self.dtype)
            )
            if gather_fn is not None:
                piece = gather_fn(piece)
            z = piece if z is None else z + piece
            off += w
        z = GroupNorm(self.ng, name="norm")(z)
        if self.act:
            z = nn.relu(z)
        return z


class LinearRes(nn.Module):
    """Linear residual block (reference layers.py:193-238)."""

    n_out: int
    ng: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n_in = x.shape[-1]
        y = Dense(self.n_out, use_bias=False, dtype=self.dtype, name="linear1")(x)
        y = GroupNorm(self.ng, name="norm1")(y)
        y = nn.relu(y)
        y = Dense(self.n_out, use_bias=False, dtype=self.dtype, name="linear2")(y)
        y = GroupNorm(self.ng, name="norm2")(y)
        if n_in != self.n_out:
            x = Dense(self.n_out, use_bias=False, dtype=self.dtype, name="transform_linear")(x)
            x = GroupNorm(self.ng, name="transform_norm")(x)
        return nn.relu(y + x)


class Conv1dBlock(nn.Module):
    """Conv1d(bias=False) + GN + optional ReLU (reference layers.py:40-62)."""

    n_out: int
    kernel_size: int = 3
    stride: int = 1
    ng: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n_in = x.shape[-1]
        w = self.param(
            "kernel",
            torch_uniform_init(n_in * self.kernel_size),
            (self.kernel_size, n_in, self.n_out),
        )
        y = conv1d(x.astype(self.dtype), w.astype(self.dtype), self.stride)
        y = GroupNorm(self.ng, name="norm")(y)
        if self.act:
            y = nn.relu(y)
        return y


class Conv2dBlock(nn.Module):
    """2-D conv + GN + optional ReLU (reference layers.py:15-37, legacy
    raster path). Channels-last [N, H, W, C]."""

    n_out: int
    kernel_size: int = 3
    stride: int = 1
    ng: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n_in = x.shape[-1]
        k = self.kernel_size
        w = self.param(
            "kernel", torch_uniform_init(n_in * k * k), (k, k, n_in, self.n_out)
        )
        pad = (k - 1) // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = GroupNorm(self.ng, name="norm")(y)
        if self.act:
            y = nn.relu(y)
        return y


class PostRes(nn.Module):
    """2-D residual block (reference layers.py:91-139, legacy raster path)."""

    n_out: int
    stride: int = 1
    ng: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n_in = x.shape[-1]

        def conv(x, w, stride):
            pad = (w.shape[0] - 1) // 2
            return jax.lax.conv_general_dilated(
                x,
                w,
                window_strides=(stride, stride),
                padding=[(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        w1 = self.param("conv1_kernel", torch_uniform_init(n_in * 9), (3, 3, n_in, self.n_out))
        w2 = self.param(
            "conv2_kernel", torch_uniform_init(self.n_out * 9), (3, 3, self.n_out, self.n_out)
        )
        y = conv(x.astype(self.dtype), w1.astype(self.dtype), self.stride)
        y = GroupNorm(self.ng, name="bn1")(y)
        y = nn.relu(y)
        y = conv(y, w2.astype(self.dtype), 1)
        y = GroupNorm(self.ng, name="bn2")(y)
        if self.stride != 1 or self.n_out != n_in:
            wd = self.param("downsample_kernel", torch_uniform_init(n_in), (1, 1, n_in, self.n_out))
            x = conv(x.astype(self.dtype), wd.astype(self.dtype), self.stride)
            x = GroupNorm(self.ng, name="downsample_norm")(x)
        y = y + x
        return nn.relu(y) if self.act else y


class Null(nn.Module):
    """Identity (reference layers.py:241-246)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return x


class EncodeDist(nn.Module):
    """Signed-log distance encoder (reference lanegcn.py:548-572 — defined
    but unused by the reference Net; provided for parity of surface)."""

    n: int
    linear: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, dist: jax.Array) -> jax.Array:
        x, y = dist[:, :1], dist[:, 1:]
        enc = jnp.concatenate(
            [
                jnp.sign(x) * jnp.log(jnp.abs(x) + 1.0),
                jnp.sign(y) * jnp.log(jnp.abs(y) + 1.0),
            ],
            axis=1,
        )
        enc = nn.relu(Dense(self.n, dtype=self.dtype, name="dense")(enc))
        if self.linear:
            enc = Dense(self.n, dtype=self.dtype, name="out")(enc)
        return enc


class Res1d(nn.Module):
    """1-D conv residual block (reference layers.py:142-190)."""

    n_out: int
    kernel_size: int = 3
    stride: int = 1
    ng: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n_in = x.shape[-1]
        w1 = self.param(
            "conv1_kernel",
            torch_uniform_init(n_in * self.kernel_size),
            (self.kernel_size, n_in, self.n_out),
        )
        w2 = self.param(
            "conv2_kernel",
            torch_uniform_init(self.n_out * self.kernel_size),
            (self.kernel_size, self.n_out, self.n_out),
        )
        y = conv1d(x.astype(self.dtype), w1.astype(self.dtype), self.stride)
        y = GroupNorm(self.ng, name="bn1")(y)
        y = nn.relu(y)
        y = conv1d(y, w2.astype(self.dtype), 1)
        y = GroupNorm(self.ng, name="bn2")(y)

        if self.stride != 1 or self.n_out != n_in:
            wd = self.param("downsample_kernel", torch_uniform_init(n_in), (1, n_in, self.n_out))
            x = conv1d(x.astype(self.dtype), wd.astype(self.dtype), self.stride)
            x = GroupNorm(self.ng, name="downsample_norm")(x)

        y = y + x
        if self.act:
            y = nn.relu(y)
        return y
