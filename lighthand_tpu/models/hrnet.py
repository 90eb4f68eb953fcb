"""HRNet (PoseHighResolutionNet): multi-resolution exchange network.

TPU-native re-design of the reference pose_hrnet.py:274-501 with the W48
topology from src/modeling/hrnet/config/cfg.yaml (and a W32 variant for the
benchmark config). Differences from a naive translation:

- NHWC + bf16 compute everywhere; BN stats f32 (see core/dtypes);
- stage loops are unrolled at trace time (branch counts are static per
  stage), so XLA sees one flat graph of large convs it can fuse/tile onto
  the MXU — no Python-object module lists at runtime;
- nearest-neighbor upsampling in the fuse layers is a jnp repeat that fuses
  with the preceding 1x1 conv.

Structure (cfg.yaml:52-90): stem 2x(3x3 s2 conv->BN->ReLU) -> layer1 = 4x
Bottleneck(64) -> 3 stages of HighResolutionModules with branch channels
[W, 2W], [W, 2W, 4W], [W, 2W, 4W, 8W]; each module runs 4 BasicBlocks per
branch then a SUM fuse (1x1 conv + upsample for coarser->finer, chains of
strided 3x3 for finer->coarser); final 1x1 conv on the W-channel branch.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from lighthand_tpu.core.dtypes import DTypePolicy, DEFAULT_POLICY
from lighthand_tpu.models.layers import (
    TORCH_CONV_KERNEL_INIT,
    BasicBlock,
    Bottleneck,
    ConvBN,
    nearest_upsample,
    torch_bias_init,
)


@dataclasses.dataclass(frozen=True)
class HRNetStageCfg:
    num_modules: int
    num_branches: int
    num_blocks: Tuple[int, ...]
    num_channels: Tuple[int, ...]
    block: str = "BASIC"  # BASIC | BOTTLENECK
    fuse_method: str = "SUM"


@dataclasses.dataclass(frozen=True)
class HRNetCfg:
    """Topology description; defaults = W48 (cfg.yaml:52-90)."""

    num_joints: int = 21
    final_conv_kernel: int = 1
    stage2: HRNetStageCfg = HRNetStageCfg(1, 2, (4, 4), (48, 96))
    stage3: HRNetStageCfg = HRNetStageCfg(4, 3, (4, 4, 4), (48, 96, 192))
    stage4: HRNetStageCfg = HRNetStageCfg(3, 4, (4, 4, 4, 4),
                                          (48, 96, 192, 384))

    @classmethod
    def w48(cls) -> "HRNetCfg":
        return cls()

    @classmethod
    def w32(cls) -> "HRNetCfg":
        return cls(
            stage2=HRNetStageCfg(1, 2, (4, 4), (32, 64)),
            stage3=HRNetStageCfg(4, 3, (4, 4, 4), (32, 64, 128)),
            stage4=HRNetStageCfg(3, 4, (4, 4, 4, 4), (32, 64, 128, 256)),
        )

    @classmethod
    def tiny(cls) -> "HRNetCfg":
        """Trace-identical-but-tiny topology for compile-budgeted checks
        (the driver's multichip dryrun). Keeps every code path of the full
        net — 4 stages, 2/3/4 branches, all fuse directions incl. the
        multi-hop strided chains (|i-j|>=2), both transitions with a new
        branch — but 1 module per stage, 1 block per branch, width 8, so
        the CPU compile of the fused train step is seconds, not minutes."""
        return cls(
            stage2=HRNetStageCfg(1, 2, (1, 1), (8, 16)),
            stage3=HRNetStageCfg(1, 3, (1, 1, 1), (8, 16, 32)),
            stage4=HRNetStageCfg(1, 4, (1, 1, 1, 1), (8, 16, 32, 64)),
        )

    @classmethod
    def from_width(cls, width: int) -> "HRNetCfg":
        return cls(
            stage2=HRNetStageCfg(1, 2, (4, 4), (width, width * 2)),
            stage3=HRNetStageCfg(4, 3, (4, 4, 4),
                                 (width, width * 2, width * 4)),
            stage4=HRNetStageCfg(3, 4, (4, 4, 4, 4),
                                 (width, width * 2, width * 4, width * 8)),
        )


_BLOCKS = {"BASIC": BasicBlock, "BOTTLENECK": Bottleneck}


class HighResolutionModule(nn.Module):
    """Parallel branches + full cross-resolution SUM fuse
    (pose_hrnet.py:101-265)."""

    cfg: HRNetStageCfg
    multi_scale_output: bool = True
    policy: DTypePolicy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool):
        c = self.cfg
        block = _BLOCKS[c.block]
        exp = block.expansion

        # Per-branch block stacks (pose_hrnet.py:139-185)
        ys = []
        for i in range(c.num_branches):
            x = xs[i]
            planes = c.num_channels[i]
            needs_down = x.shape[-1] != planes * exp
            x = block(planes, 1, needs_down, self.policy,
                      name=f"branch{i}_block0")(x, train)
            for b in range(1, c.num_blocks[i]):
                x = block(planes, 1, False, self.policy,
                          name=f"branch{i}_block{b}")(x, train)
            ys.append(x)

        # Fuse (pose_hrnet.py:187-265): out_i = ReLU(sum_j f_ij(y_j))
        n_out = c.num_branches if self.multi_scale_output else 1
        outs = []
        for i in range(n_out):
            ci = c.num_channels[i] * exp
            acc = ys[i]
            for j in range(c.num_branches):
                if j == i:
                    continue
                if j > i:
                    # coarser -> finer: 1x1 conv + BN + nearest 2^(j-i)
                    t = ConvBN(ci, 1, 1, relu=False, policy=self.policy,
                               name=f"fuse{i}_{j}")(ys[j], train)
                    t = nearest_upsample(t, 2 ** (j - i))
                else:
                    # finer -> coarser: chain of (i-j) stride-2 3x3 convs;
                    # intermediate hops keep C_j and ReLU, last hop -> C_i
                    t = ys[j]
                    cj = c.num_channels[j] * exp
                    for k in range(i - j):
                        last = k == i - j - 1
                        t = ConvBN(ci if last else cj, 3, 2, relu=not last,
                                   policy=self.policy,
                                   name=f"fuse{i}_{j}_k{k}")(t, train)
                acc = acc + t
            outs.append(nn.relu(acc))
        return outs


class PoseHRNet(nn.Module):
    """Full network (pose_hrnet.py:274-460)."""

    cfg: HRNetCfg = HRNetCfg.w48()
    policy: DTypePolicy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        x = x.astype(self.policy.compute_dtype)

        # Stem: 2x 3x3 s2 conv (pose_hrnet.py:282-288) -> 64x64 spatial
        x = ConvBN(64, 3, 2, relu=True, policy=self.policy, name="stem1")(x, train)
        x = ConvBN(64, 3, 2, relu=True, policy=self.policy, name="stem2")(x, train)

        # layer1: 4x Bottleneck(64) -> 256ch (pose_hrnet.py:289)
        for i in range(4):
            needs_down = x.shape[-1] != 64 * Bottleneck.expansion
            x = Bottleneck(64, 1, needs_down, self.policy,
                           name=f"layer1_block{i}")(x, train)

        # transition1 (pose_hrnet.py:297): 256 -> [W (s1), 2W (s2)]
        xs = [
            ConvBN(c.stage2.num_channels[0], 3, 1, relu=True,
                   policy=self.policy, name="transition1_b0")(x, train),
            ConvBN(c.stage2.num_channels[1], 3, 2, relu=True,
                   policy=self.policy, name="transition1_b1")(x, train),
        ]

        xs = self._run_stage(c.stage2, xs, "stage2", train,
                             multi_scale_output=True)
        xs = self._transition(c.stage2, c.stage3, xs, "transition2", train)
        xs = self._run_stage(c.stage3, xs, "stage3", train,
                             multi_scale_output=True)
        xs = self._transition(c.stage3, c.stage4, xs, "transition3", train)
        xs = self._run_stage(c.stage4, xs, "stage4", train,
                             multi_scale_output=False)

        # final 1x1 conv on the highest-resolution branch (pose_hrnet.py:323,458)
        k = c.final_conv_kernel
        out = nn.Conv(
            c.num_joints,
            (k, k),
            padding="SAME" if k == 3 else "VALID",
            kernel_init=TORCH_CONV_KERNEL_INIT,
            bias_init=torch_bias_init(xs[0].shape[-1] * k**2),
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name="final_layer",
        )(xs[0])
        return out.astype(self.policy.output_dtype)

    def _transition(self, prev: HRNetStageCfg, cur: HRNetStageCfg,
                    xs, name: str, train: bool):
        """pose_hrnet.py:333-372: identity on matching branches; the new
        branch is a stride-2 3x3 conv chain from the LAST previous branch."""
        exp_prev = _BLOCKS[prev.block].expansion
        exp_cur = _BLOCKS[cur.block].expansion
        outs = []
        for i in range(cur.num_branches):
            if i < prev.num_branches:
                c_prev = prev.num_channels[i] * exp_prev
                c_cur = cur.num_channels[i] * exp_cur
                if c_prev != c_cur:
                    outs.append(ConvBN(c_cur, 3, 1, relu=True,
                                       policy=self.policy,
                                       name=f"{name}_b{i}")(xs[i], train))
                else:
                    outs.append(xs[i])
            else:
                t = xs[-1]
                for j in range(i + 1 - prev.num_branches):
                    last = j == i - prev.num_branches
                    feat = (cur.num_channels[i] * exp_cur if last
                            else t.shape[-1])
                    t = ConvBN(feat, 3, 2, relu=True, policy=self.policy,
                               name=f"{name}_b{i}_k{j}")(t, train)
                outs.append(t)
        return outs

    def _run_stage(self, cfg: HRNetStageCfg, xs, name: str, train: bool,
                   multi_scale_output: bool):
        for m in range(cfg.num_modules):
            last = m == cfg.num_modules - 1
            mso = multi_scale_output or not last
            xs = HighResolutionModule(
                cfg, multi_scale_output=mso, policy=self.policy,
                name=f"{name}_module{m}",
            )(xs, train)
        return xs
