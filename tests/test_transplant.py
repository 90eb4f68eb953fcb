"""Weight-transplant forward-equivalence: transplant randomly-initialized
REFERENCE torch weights into the Flax models and assert the two frameworks
compute the same function in f32.

This is the strongest topology-parity statement available in this image:
it catches any branch/fuse/transition/padding mistake that param-count
checks cannot (e.g. the SAME-vs-torch stride-2 padding misalignment fixed
in models/layers.py:ConvBN).
"""

import numpy as np
import pytest

from lighthand_tpu.core.dtypes import DTypePolicy
from lighthand_tpu.models import get_model
from lighthand_tpu.utils.torch_port import (
    pose_hrnet_from_torch,
    pose_resnet_from_torch,
    validate_against,
)

from ref_models import reference_pose_hrnet, reference_pose_resnet

F32 = DTypePolicy.full_precision()


def _forward_pair(torch_model, flax_model, variables, size, seed=0):
    import torch

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(2, size, size, 3)).astype(np.float32)

    torch_model.eval()
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2)))).numpy()
    ours = np.asarray(flax_model.apply(variables, x, train=False))
    return np.transpose(ours, (0, 3, 1, 2)), ref


def test_pose_resnet50_forward_equivalence():
    torch_model = reference_pose_resnet(50, 21)
    sd = torch_model.state_dict()
    variables = pose_resnet_from_torch(sd, num_layers=50)

    model = get_model("resnet50", policy=F32)
    import jax
    import jax.numpy as jnp

    init_tree = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    validate_against(variables, init_tree)

    ours, ref = _forward_pair(torch_model, model, variables, size=64)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_pose_hrnet_w32_forward_equivalence():
    torch_model = reference_pose_hrnet(32, 21)
    sd = torch_model.state_dict()
    variables = pose_hrnet_from_torch(sd)

    model = get_model("hrnet_w32", policy=F32)
    import jax
    import jax.numpy as jnp

    init_tree = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    validate_against(variables, init_tree)

    ours, ref = _forward_pair(torch_model, model, variables, size=64)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_transplant_rejects_wrong_architecture():
    torch_model = reference_pose_resnet(18, 21)
    with pytest.raises((KeyError, ValueError)):
        pose_resnet_from_torch(torch_model.state_dict(), num_layers=50)
