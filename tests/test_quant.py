"""int8 forward-conv path (ops/quant.py + DTypePolicy.int8_fwd).

The reference trains pure f32 (no AMP in /root/reference/src); int8_fwd
is a TPU extension grounded by the measured ~2x conv-kernel speedup on
v5e (tools/int8_probe.py, BASELINE.md "The int8 lever"). These tests pin
its contract: quantized forward stays within quantization error of the
float conv, the STE backward is EXACTLY the float conv's gradient, the
param tree is identical to the bf16 policy (shared checkpoints), and a
training step with the policy actually learns.
"""

import jax
import jax.numpy as jnp
import numpy as np

from lighthand_tpu.core.dtypes import DTypePolicy
from lighthand_tpu.models import get_model
from lighthand_tpu.ops.quant import int8_conv
from lighthand_tpu.train import create_train_state
from lighthand_tpu.train.step import make_fused_train_step


def _plain(x, w, strides=(1, 1), padding=((1, 1), (1, 1))):
    return jax.lax.conv_general_dilated(
        x, w, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_int8_conv_forward_within_quant_error(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.float32)
    y = int8_conv(x, w, (1, 1), ((1, 1), (1, 1)), 8.0, jnp.float32)
    ref = _plain(x, w)
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(y - ref)))
    # per-tensor act quant at clip 8 + per-channel weight quant: worst-case
    # relative error a couple percent on random normal data
    assert err < 0.05 * scale, (err, scale)


def test_int8_conv_ste_gradient_exact(rng):
    """Backward must be EXACTLY the float conv's vjp (straight-through)."""
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 4)) * 0.1, jnp.float32)

    # compare full vjp on an arbitrary cotangent, not just sum()
    y_q, vjp_q = jax.vjp(lambda x, w: int8_conv(
        x, w, (1, 1), ((1, 1), (1, 1)), 8.0, jnp.float32), x, w)
    y_p, vjp_p = jax.vjp(lambda x, w: _plain(x, w), x, w)
    g = jnp.asarray(np.random.default_rng(1).standard_normal(y_q.shape),
                    jnp.float32)
    dxq, dwq = vjp_q(g)
    dxp, dwp = vjp_p(g)
    np.testing.assert_array_equal(np.asarray(dxq), np.asarray(dxp))
    np.testing.assert_array_equal(np.asarray(dwq), np.asarray(dwp))


def test_int8_policy_param_tree_matches_bf16():
    """int8_fwd must share checkpoints with the default policy: identical
    param paths and shapes (QuantConv is named Conv_0 on purpose)."""
    x = jnp.zeros((1, 64, 64, 3))
    v_bf = get_model("resnet18", policy=DTypePolicy()).init(
        jax.random.PRNGKey(0), x, train=False)
    v_q = get_model("resnet18", policy=DTypePolicy.int8_fwd()).init(
        jax.random.PRNGKey(0), x, train=False)
    p_bf = jax.tree_util.tree_map(lambda a: a.shape, v_bf["params"])
    p_q = jax.tree_util.tree_map(lambda a: a.shape, v_q["params"])
    assert p_bf == p_q


def test_int8_policy_trains(rng):
    """Fused step with quant_fwd: loss finite and decreasing (the STE
    forward is lossy but the gradient signal is the float one)."""
    model = get_model("resnet18", policy=DTypePolicy.int8_fwd())
    state = create_train_state(model, jax.random.PRNGKey(0),
                               input_shape=(1, 64, 64, 3), lr=1e-3)
    step = make_fused_train_step(heatmap_size=16, stride=4.0, jitter=False,
                                 scan_steps=1, use_pallas_aug=False)
    batch = {
        "image_u8": jnp.asarray(
            rng.integers(0, 256, size=(4, 64, 64, 3)), jnp.uint8),
        "joints": jnp.asarray(
            rng.uniform(8, 56, size=(4, 21, 2)), jnp.float32),
        "aug_enabled": jnp.zeros(4, jnp.float32),
    }
    losses = []
    for i in range(30):
        state, m = step(state, jax.random.PRNGKey(i), batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])


def test_serving_policy_override():
    """cli.eval --precision int8_fwd must force the quantized forward on
    ANY checkpoint (shared param tree makes that safe); otherwise the
    checkpoint's recorded precision wins, then the CLI default."""
    from lighthand_tpu.cli.eval import serving_policy

    f32_info = {"name": "simplebaseline", "precision": "f32"}
    bf16_info = {"name": "simplebaseline", "precision": "bf16"}

    assert serving_policy("int8_fwd", f32_info).quant_fwd
    assert serving_policy("int8_fwd", None).quant_fwd
    assert serving_policy("bf16", f32_info).param_dtype == jnp.float32
    assert serving_policy("bf16", f32_info).compute_dtype == jnp.float32
    assert serving_policy("bf16", bf16_info).compute_dtype == jnp.bfloat16
    assert not serving_policy("bf16", bf16_info).quant_fwd
    # legacy checkpoint (no model_info): CLI precision is the fallback
    assert serving_policy("f32", None).compute_dtype == jnp.float32
    assert serving_policy("bf16", None).compute_dtype == jnp.bfloat16
