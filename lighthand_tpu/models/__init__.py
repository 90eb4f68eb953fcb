"""Model registry.

Replaces the reference's factory pair ``get_pose_net``
(simplebaseline/pose_resnet.py:308) / ``get_hrnet`` (hrnet/pose_hrnet.py:495)
and the yaml/EasyDict config split with a single name-keyed registry.
"""

from __future__ import annotations

import flax.linen as nn

from lighthand_tpu.core.dtypes import DTypePolicy, DEFAULT_POLICY
from lighthand_tpu.models.hrnet import HRNetCfg, PoseHRNet
from lighthand_tpu.models.resnet import PoseResNet


def get_model(name: str, num_joints: int = 21,
              policy: DTypePolicy = DEFAULT_POLICY) -> nn.Module:
    """name: 'simplebaseline' (= resnet50), 'resnet{18,34,50,101,152}',
    'hrnet' (= hrnet_w48, matching the reference cfg.yaml), 'hrnet_w32',
    'hrnet_w48', 'hrnet_tiny' (compile-budget test topology)."""
    name = name.lower()
    if name in ("simplebaseline", "resnet", "resnet50"):
        return PoseResNet(num_layers=50, num_joints=num_joints, policy=policy)
    if name.startswith("resnet"):
        return PoseResNet(num_layers=int(name[len("resnet"):]),
                          num_joints=num_joints, policy=policy)
    if name in ("hrnet", "hrnet_w48"):
        return PoseHRNet(cfg=HRNetCfg.w48(), policy=policy)
    if name == "hrnet_w32":
        return PoseHRNet(cfg=HRNetCfg.w32(), policy=policy)
    if name == "hrnet_tiny":
        return PoseHRNet(cfg=HRNetCfg.tiny(), policy=policy)
    if name.startswith("hrnet_w"):
        return PoseHRNet(cfg=HRNetCfg.from_width(int(name[len("hrnet_w"):])),
                         policy=policy)
    raise ValueError(
        f"unknown model {name!r}; expected simplebaseline|resnetN|hrnet[_wN]"
    )


__all__ = ["get_model", "PoseResNet", "PoseHRNet", "HRNetCfg"]
