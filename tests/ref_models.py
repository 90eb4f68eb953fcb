"""Load the REFERENCE PyTorch models in place (never copied) so tests can
compare against them directly. Mirrors tools/parity_torch.py:38-56."""

from __future__ import annotations

import importlib.util
from types import SimpleNamespace

REF_POSE_RESNET = "/root/reference/src/modeling/simplebaseline/pose_resnet.py"
REF_POSE_HRNET = "/root/reference/src/modeling/hrnet/pose_hrnet.py"


def _load(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def reference_pose_resnet(num_layers: int = 50, num_joints: int = 21):
    mod = _load(REF_POSE_RESNET, "ref_pose_resnet")
    cfg = SimpleNamespace(MODEL=SimpleNamespace(
        NUM_JOINTS=num_joints,
        INIT_WEIGHTS=False,
        STYLE="pytorch",
        EXTRA=SimpleNamespace(
            NUM_LAYERS=num_layers,
            NUM_DECONV_LAYERS=3,
            NUM_DECONV_FILTERS=[256, 256, 256],
            NUM_DECONV_KERNELS=[4, 4, 4],
            DECONV_WITH_BIAS=False,
            FINAL_CONV_KERNEL=1,
        ),
    ))
    return mod.get_pose_net(cfg, is_train=True)


def reference_pose_hrnet(width: int = 32, num_joints: int = 21):
    """Build the reference PoseHighResolutionNet with the cfg.yaml topology
    (src/modeling/hrnet/config/cfg.yaml:52-90) at the given base width."""
    mod = _load(REF_POSE_HRNET, "ref_pose_hrnet")

    def stage(n_mod, n_br, blocks, channels):
        return {"NUM_MODULES": n_mod, "NUM_BRANCHES": n_br, "BLOCK": "BASIC",
                "NUM_BLOCKS": blocks, "NUM_CHANNELS": channels,
                "FUSE_METHOD": "SUM"}

    w = width
    cfg = {"MODEL": {
        "NUM_JOINTS": num_joints,
        "INIT_WEIGHTS": False,
        "EXTRA": {
            "FINAL_CONV_KERNEL": 1,
            "PRETRAINED_LAYERS": ["*"],
            "STAGE2": stage(1, 2, [4, 4], [w, 2 * w]),
            "STAGE3": stage(4, 3, [4, 4, 4], [w, 2 * w, 4 * w]),
            "STAGE4": stage(3, 4, [4, 4, 4, 4], [w, 2 * w, 4 * w, 8 * w]),
        },
    }}
    return mod.get_hrnet(cfg, is_train=True)
