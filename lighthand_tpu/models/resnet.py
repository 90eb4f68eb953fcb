"""SimpleBaseline: ResNet backbone + deconvolution head -> 21 heatmaps.

TPU-native re-design of the reference PoseResNet
(src/modeling/simplebaseline/pose_resnet.py:144-322):
input [B, 256, 256, 3] NHWC -> ResNet-{18,34,50,101,152} -> 3x
(ConvTranspose 4x4 stride 2, 256ch, BN, ReLU) -> 1x1 conv -> [B, 64, 64, 21].

Everything is a single jit-compiled Flax module; the MXU sees large NHWC
convs in bf16, BN statistics stay f32, and the final heatmap logits are f32.
"""

from __future__ import annotations

from typing import Sequence, Type

import flax.linen as nn
import jax.numpy as jnp

from lighthand_tpu.core.dtypes import DTypePolicy, DEFAULT_POLICY
from lighthand_tpu.models.layers import (
    BN_EPS,
    BN_MOMENTUM,
    TORCH_CONV_KERNEL_INIT,
    BasicBlock,
    Bottleneck,
    BottleneckCaffe,
    ConvBN,
    max_pool_3x3_s2,
    torch_bias_init,
)

# resnet_spec (pose_resnet.py:301-305)
RESNET_SPEC = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


class DeconvBNRelu(nn.Module):
    """ConvTranspose 4x4 stride-2 (pad 1 / output size 2x) + BN + ReLU
    (pose_resnet.py:207-232)."""

    features: int
    policy: DTypePolicy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.ConvTranspose(
            self.features,
            (4, 4),
            strides=(2, 2),
            padding="SAME",
            use_bias=False,  # DECONV_WITH_BIAS: false (simplebaseline/config.py)
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
        return nn.relu(x.astype(self.policy.compute_dtype))


class PoseResNet(nn.Module):
    """SimpleBaseline pose net.

    Attributes mirror the reference config defaults
    (src/modeling/simplebaseline/config.py: NUM_LAYERS 50, 3 deconv layers of
    256 filters, kernel 4, FINAL_CONV_KERNEL 1, NUM_JOINTS 21).
    """

    num_layers: int = 50
    num_joints: int = 21
    deconv_filters: Sequence[int] = (256, 256, 256)
    final_conv_kernel: int = 1
    caffe_style: bool = False
    policy: DTypePolicy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False):
        block, layers = RESNET_SPEC[self.num_layers]
        if self.caffe_style:
            block = BottleneckCaffe
        x = x.astype(self.policy.compute_dtype)

        # Stem: 7x7 s2 conv + BN + ReLU + 3x3 s2 maxpool (pose_resnet.py:152-156)
        x = ConvBN(64, 7, 2, relu=True, policy=self.policy,
                   name="stem")(x, train)
        x = max_pool_3x3_s2(x)

        # Residual stages (pose_resnet.py:157-160)
        for stage, (planes, blocks, stride) in enumerate(
            zip((64, 128, 256, 512), layers, (1, 2, 2, 2))
        ):
            in_feat = x.shape[-1]
            needs_down = stride != 1 or in_feat != planes * block.expansion
            x = block(planes, stride, needs_down, self.policy,
                      name=f"layer{stage + 1}_block0")(x, train)
            for i in range(1, blocks):
                x = block(planes, 1, False, self.policy,
                          name=f"layer{stage + 1}_block{i}")(x, train)

        # Deconv head: 8x8 -> 64x64 (pose_resnet.py:207-232)
        for i, feat in enumerate(self.deconv_filters):
            x = DeconvBNRelu(feat, self.policy, name=f"deconv{i}")(x, train)

        # Final 1x1 (or 3x3) conv -> heatmap logits, f32 (pose_resnet.py:169-175)
        x = nn.Conv(
            self.num_joints,
            (self.final_conv_kernel, self.final_conv_kernel),
            padding="SAME" if self.final_conv_kernel == 3 else "VALID",
            kernel_init=TORCH_CONV_KERNEL_INIT,
            bias_init=torch_bias_init(
                x.shape[-1] * self.final_conv_kernel**2),
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name="final_layer",
        )(x)
        return x.astype(self.policy.output_dtype)
