"""Shared Flax building blocks for the pose backbones.

TPU-first conventions: NHWC layout (XLA's native conv layout on TPU),
bf16 compute with f32 params and f32 BatchNorm statistics
(core/dtypes.DTypePolicy). Torch BatchNorm momentum 0.1 maps to Flax
momentum 0.9 (EMA keeps 0.9 of the old value).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from lighthand_tpu.core.dtypes import DTypePolicy, DEFAULT_POLICY

BN_MOMENTUM = 0.9  # == 1 - torch BN_MOMENTUM (pose_resnet.py:19)
BN_EPS = 1e-5

ModuleDef = Any

# torch's default Conv2d/ConvTranspose2d initialization: kaiming_uniform
# with a=sqrt(5), i.e. Uniform(+-sqrt(1/fan_in)) => variance 1/(3*fan_in).
# The reference never calls its init_weights (get_pose_net comments it out,
# pose_resnet.py:319-320), so torch defaults ARE its effective init; the
# head-to-head parity runs (tools/parity_*.py) compare against exactly
# this. Flax's lecun_normal has 3x the variance, which measurably changes
# early training dynamics on the heatmap head.
TORCH_CONV_KERNEL_INIT = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    """torch's default bias init: Uniform(+-1/sqrt(fan_in))."""
    import jax

    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class QuantConv(nn.Module):
    """int8-forward conv (ops/quant.py:int8_conv): same param tree as the
    nn.Conv it replaces (pass ``name="Conv_0"``), so bf16 and int8_fwd
    policies share checkpoints and the torch transplant path."""

    features: int
    kernel_size: tuple
    strides: tuple
    padding: Any
    act_clip: float
    compute_dtype: Any
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from lighthand_tpu.ops.quant import int8_conv

        kh, kw = self.kernel_size
        w = self.param("kernel", TORCH_CONV_KERNEL_INIT,
                       (kh, kw, x.shape[-1], self.features),
                       self.param_dtype)
        return int8_conv(x, w, self.strides, self.padding,
                         self.act_clip, self.compute_dtype)


class ConvBN(nn.Module):
    """Conv -> BatchNorm (no bias on the conv, like every reference conv)."""

    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    policy: DTypePolicy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool):
        # Explicit symmetric padding = torch's padding=k//2. Identical to
        # "SAME" at stride 1 (odd k), but at stride 2 on even inputs XLA
        # SAME pads (0,1) while torch pads (1,1) — a one-pixel window
        # misalignment that breaks exact forward equivalence with the
        # reference (verified by tests/test_transplant.py).
        p = self.kernel // 2
        padding = ((p, p), (p, p)) if self.kernel > 1 else "VALID"
        if self.policy.quant_fwd:
            x = QuantConv(
                self.features,
                kernel_size=(self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=padding,
                act_clip=self.policy.act_clip,
                compute_dtype=self.policy.compute_dtype,
                param_dtype=self.policy.param_dtype,
                name="Conv_0",  # param-tree parity with the nn.Conv path
            )(x)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=padding,
                use_bias=False,
                kernel_init=TORCH_CONV_KERNEL_INIT,
                dtype=self.policy.compute_dtype,
                param_dtype=self.policy.param_dtype,
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.policy.bn_dtype,
            param_dtype=self.policy.param_dtype,
        )(x)
        x = x.astype(self.policy.compute_dtype)
        if self.relu:
            x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    """2x 3x3 conv residual block (pose_resnet.py:29-58). expansion = 1."""

    planes: int
    stride: int = 1
    downsample: bool = False
    policy: DTypePolicy = DEFAULT_POLICY

    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = ConvBN(self.planes, 3, self.stride, relu=True,
                     policy=self.policy)(x, train)
        out = ConvBN(self.planes, 3, 1, relu=False,
                     policy=self.policy)(out, train)
        if self.downsample:
            residual = ConvBN(self.planes * self.expansion, 1, self.stride,
                              relu=False, policy=self.policy)(x, train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 residual block (pose_resnet.py:61-99). expansion=4."""

    planes: int
    stride: int = 1
    downsample: bool = False
    policy: DTypePolicy = DEFAULT_POLICY

    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = ConvBN(self.planes, 1, 1, relu=True, policy=self.policy)(x, train)
        out = ConvBN(self.planes, 3, self.stride, relu=True,
                     policy=self.policy)(out, train)
        out = ConvBN(self.planes * self.expansion, 1, 1, relu=False,
                     policy=self.policy)(out, train)
        if self.downsample:
            residual = ConvBN(self.planes * self.expansion, 1, self.stride,
                              relu=False, policy=self.policy)(x, train)
        return nn.relu(out + residual)


class BottleneckCaffe(nn.Module):
    """Caffe-style bottleneck: the stride sits on the first 1x1 conv
    (pose_resnet.py:102-141)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    policy: DTypePolicy = DEFAULT_POLICY

    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = ConvBN(self.planes, 1, self.stride, relu=True,
                     policy=self.policy)(x, train)
        out = ConvBN(self.planes, 3, 1, relu=True, policy=self.policy)(out, train)
        out = ConvBN(self.planes * self.expansion, 1, 1, relu=False,
                     policy=self.policy)(out, train)
        if self.downsample:
            residual = ConvBN(self.planes * self.expansion, 1, self.stride,
                              relu=False, policy=self.policy)(x, train)
        return nn.relu(out + residual)


def nearest_upsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """nn.Upsample(scale_factor=2**(j-i), mode='nearest') equivalent
    (pose_hrnet.py:206) — cheap jnp repeat, fuses with the preceding conv."""
    x = jnp.repeat(x, factor, axis=1)
    x = jnp.repeat(x, factor, axis=2)
    return x


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(kernel=3, stride=2, padding=1)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
