"""Import reference PyTorch checkpoints into the Flax models.

Converts a torch ``state_dict`` (as produced by the reference
``PoseResNet`` — src/modeling/simplebaseline/pose_resnet.py:144-248 — and
``PoseHighResolutionNet`` — src/modeling/hrnet/pose_hrnet.py:274-460) into
the exact ``{"params", "batch_stats"}`` variable tree of
``lighthand_tpu.models.PoseResNet`` / ``PoseHRNet``.

This is both a migration feature (users of the reference bring their
trained ``.bin``/``.pth`` weights) and the strongest available parity
evidence: tests/test_transplant.py transplants randomly-initialized
reference weights and asserts the two frameworks compute the SAME forward
function in f32.

Weight conventions:
- torch Conv2d weight [O, I, kh, kw]  -> Flax [kh, kw, I, O];
- torch ConvTranspose2d weight [I, O, kh, kw] -> Flax [kh, kw, I, O] with
  the spatial dims FLIPPED (torch's transposed conv is the gradient of a
  conv, i.e. correlation with the flipped kernel; Flax's ConvTranspose
  with transpose_kernel=False applies the kernel unflipped — verified
  numerically against torch.nn.functional.conv_transpose2d);
- BatchNorm weight/bias/running_mean/running_var -> scale/bias/mean/var.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

from lighthand_tpu.models.hrnet import HRNetCfg
from lighthand_tpu.models.resnet import RESNET_SPEC

Path = Tuple[str, ...]


def _np(t) -> np.ndarray:
    """torch tensor or array-like -> float32 numpy (host)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv_kernel(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def _deconv_kernel(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 0, 1)[::-1, ::-1].copy()


class _TreeBuilder:
    def __init__(self, sd: Mapping[str, "np.ndarray"]):
        self.sd = dict(sd)
        self.params: Dict[Path, np.ndarray] = {}
        self.stats: Dict[Path, np.ndarray] = {}

    def take(self, key: str) -> np.ndarray:
        try:
            return self.sd.pop(key)
        except KeyError:
            raise KeyError(f"state_dict has no entry {key!r}") from None

    def conv_bn(self, fpath: Path, tconv: str, tbn: str) -> None:
        """One reference conv+BN pair into a Flax ConvBN module at fpath."""
        self.params[fpath + ("Conv_0", "kernel")] = _conv_kernel(
            self.take(f"{tconv}.weight"))
        self.bn(fpath + ("BatchNorm_0",), tbn)

    def bn(self, fpath: Path, tbn: str) -> None:
        self.params[fpath + ("scale",)] = _np(self.take(f"{tbn}.weight"))
        self.params[fpath + ("bias",)] = _np(self.take(f"{tbn}.bias"))
        self.stats[fpath + ("mean",)] = _np(self.take(f"{tbn}.running_mean"))
        self.stats[fpath + ("var",)] = _np(self.take(f"{tbn}.running_var"))
        self.sd.pop(f"{tbn}.num_batches_tracked", None)

    def residual_block(self, fpath: Path, tprefix: str, n_convs: int) -> None:
        """BasicBlock (n_convs=2) / Bottleneck (n_convs=3) + optional
        downsample (reference pose_resnet.py:29-141)."""
        for n in range(1, n_convs + 1):
            self.conv_bn(fpath + (f"ConvBN_{n - 1}",),
                         f"{tprefix}.conv{n}", f"{tprefix}.bn{n}")
        if f"{tprefix}.downsample.0.weight" in self.sd:
            self.conv_bn(fpath + (f"ConvBN_{n_convs}",),
                         f"{tprefix}.downsample.0", f"{tprefix}.downsample.1")

    def finish(self) -> Dict[str, dict]:
        from flax.traverse_util import unflatten_dict

        leftovers = [k for k in self.sd if not k.endswith(
            "num_batches_tracked")]
        if leftovers:
            raise ValueError(f"unconsumed torch entries: {leftovers[:8]}"
                             f"{'...' if len(leftovers) > 8 else ''}")
        return {"params": unflatten_dict(self.params),
                "batch_stats": unflatten_dict(self.stats)}


def pose_resnet_from_torch(state_dict: Mapping[str, "np.ndarray"],
                           num_layers: int = 50) -> Dict[str, dict]:
    """Reference PoseResNet state_dict -> Flax variables
    (pose_resnet.py:144-248; deconv head :207-232)."""
    b = _TreeBuilder(state_dict)
    block, layers = RESNET_SPEC[num_layers]
    n_convs = 3 if block.expansion == 4 else 2

    b.conv_bn(("stem",), "conv1", "bn1")
    for stage, blocks in enumerate(layers):
        for i in range(blocks):
            b.residual_block((f"layer{stage + 1}_block{i}",),
                             f"layer{stage + 1}.{i}", n_convs)
    # deconv head: Sequential [deconv, BN, ReLU] x3 -> indices 0,3,6
    for k in range(3):
        b.params[(f"deconv{k}", "ConvTranspose_0", "kernel")] = \
            _deconv_kernel(b.take(f"deconv_layers.{3 * k}.weight"))
        b.bn((f"deconv{k}", "BatchNorm_0"), f"deconv_layers.{3 * k + 1}")
    b.params[("final_layer", "kernel")] = _conv_kernel(
        b.take("final_layer.weight"))
    b.params[("final_layer", "bias")] = _np(b.take("final_layer.bias"))
    return b.finish()


def pose_hrnet_from_torch(state_dict: Mapping[str, "np.ndarray"],
                          cfg: HRNetCfg | None = None) -> Dict[str, dict]:
    """Reference PoseHighResolutionNet state_dict -> Flax variables
    (pose_hrnet.py:274-460; module naming: branches/fuse_layers/transition
    Sequentials)."""
    cfg = cfg or HRNetCfg.w32()
    b = _TreeBuilder(state_dict)

    b.conv_bn(("stem1",), "conv1", "bn1")
    b.conv_bn(("stem2",), "conv2", "bn2")
    for i in range(4):
        b.residual_block((f"layer1_block{i}",), f"layer1.{i}", 3)

    # transition1 (pose_hrnet.py:297): both branches change channels, so
    # both exist; branch 0 is Sequential(conv, bn, relu), branch 1 (new)
    # is Sequential(Sequential(conv, bn, relu)).
    b.conv_bn(("transition1_b0",), "transition1.0.0", "transition1.0.1")
    b.conv_bn(("transition1_b1",), "transition1.1.0.0", "transition1.1.0.1")

    stages = {"stage2": cfg.stage2, "stage3": cfg.stage3,
              "stage4": cfg.stage4}
    for sname, scfg in stages.items():
        n_convs = 3 if scfg.block == "BOTTLENECK" else 2
        for m in range(scfg.num_modules):
            mpath = (f"{sname}_module{m}",)
            tmod = f"{sname}.{m}"
            for i in range(scfg.num_branches):
                for blk in range(scfg.num_blocks[i]):
                    b.residual_block(mpath + (f"branch{i}_block{blk}",),
                                     f"{tmod}.branches.{i}.{blk}", n_convs)
            last = m == scfg.num_modules - 1
            mso = (sname != "stage4") or not last
            n_out = scfg.num_branches if mso else 1
            for i in range(n_out):
                for j in range(scfg.num_branches):
                    if j == i:
                        continue
                    if j > i:
                        b.conv_bn(mpath + (f"fuse{i}_{j}",),
                                  f"{tmod}.fuse_layers.{i}.{j}.0",
                                  f"{tmod}.fuse_layers.{i}.{j}.1")
                    else:
                        for k in range(i - j):
                            b.conv_bn(
                                mpath + (f"fuse{i}_{j}_k{k}",),
                                f"{tmod}.fuse_layers.{i}.{j}.{k}.0",
                                f"{tmod}.fuse_layers.{i}.{j}.{k}.1")

    # transition2/3 (pose_hrnet.py:333-372): matching-width branches are
    # identity (None in torch, absent here); the one NEW branch is a
    # single-hop strided conv chain from the last previous branch.
    for t, scfg in (("transition2", cfg.stage3), ("transition3", cfg.stage4)):
        prev_branches = scfg.num_branches - 1
        for i in range(scfg.num_branches):
            if f"{t}.{i}.0.weight" in b.sd:  # existing branch, width change
                b.conv_bn((f"{t}_b{i}",), f"{t}.{i}.0", f"{t}.{i}.1")
        new = prev_branches
        b.conv_bn((f"{t}_b{new}_k0",), f"{t}.{new}.0.0", f"{t}.{new}.0.1")

    b.params[("final_layer", "kernel")] = _conv_kernel(
        b.take("final_layer.weight"))
    b.params[("final_layer", "bias")] = _np(b.take("final_layer.bias"))
    return b.finish()


def validate_against(variables: Dict[str, dict],
                     reference_tree: Dict[str, dict]) -> None:
    """Assert the transplanted tree has exactly the model's structure
    (same paths, same shapes). ``reference_tree`` = model.init(...)."""
    from flax.traverse_util import flatten_dict

    got = flatten_dict(variables)
    want = flatten_dict(reference_tree)
    missing = sorted(set(map("/".join, want)) - set(map("/".join, got)))
    extra = sorted(set(map("/".join, got)) - set(map("/".join, want)))
    if missing or extra:
        raise ValueError(f"tree mismatch: missing={missing[:6]} "
                         f"extra={extra[:6]}")
    for k, v in want.items():
        if tuple(got[k].shape) != tuple(v.shape):
            raise ValueError(f"shape mismatch at {'/'.join(k)}: "
                             f"{got[k].shape} vs {v.shape}")
