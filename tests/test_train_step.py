import jax
import jax.numpy as jnp
import numpy as np

from lighthand_tpu.core.dtypes import DTypePolicy
from lighthand_tpu.models import get_model
from lighthand_tpu.train import (
    create_train_state,
    make_eval_step,
    make_train_step,
    cosine_lr,
)
from lighthand_tpu.train.state import set_learning_rate


def _tiny_batch(rng, b=4, size=64, hm=16):
    imgs = rng.normal(size=(b, size, size, 3)).astype(np.float32)
    joints = rng.uniform(8, size - 8, size=(b, 21, 2)).astype(np.float32)
    return {"image": jnp.asarray(imgs), "joints": jnp.asarray(joints)}


def test_overfit_single_batch(rng):
    """One-batch overfit smoke test (SURVEY.md section 4): loss must drop
    substantially within a few dozen steps."""
    model = get_model("resnet18", policy=DTypePolicy.full_precision())
    state = create_train_state(model, jax.random.PRNGKey(0),
                               input_shape=(1, 64, 64, 3), lr=1e-3)
    # heatmap at stride 4 of a 64px image -> 16x16
    train_step = make_train_step(heatmap_size=16, stride=4.0)
    batch = _tiny_batch(rng)

    state, m0 = train_step(state, batch)
    first = float(m0["loss"])
    for _ in range(40):
        state, m = train_step(state, batch)
    last = float(m["loss"])
    assert last < first * 0.5, (first, last)


def test_eval_step_metrics(rng):
    model = get_model("resnet18", policy=DTypePolicy.full_precision())
    state = create_train_state(model, jax.random.PRNGKey(0),
                               input_shape=(1, 64, 64, 3))
    eval_step = make_eval_step(heatmap_size=16, stride=4.0)
    batch = _tiny_batch(rng)
    m = eval_step(state, batch)
    assert 0.0 <= float(m["pck"]) <= 1.0
    assert float(m["epe_count"]) == 4 * 19
    assert m["pred_joints"].shape == (4, 21, 2)
    assert np.isfinite(float(m["loss"]))


def test_cosine_lr_matches_torch_formula():
    # epoch 0 -> base lr; epoch T_max -> 0
    assert cosine_lr(1e-3, 0, 100) == 1e-3
    assert abs(cosine_lr(1e-3, 100, 100)) < 1e-12
    assert abs(cosine_lr(1e-3, 50, 100) - 5e-4) < 1e-12


def test_set_learning_rate_applies(rng):
    model = get_model("resnet18", policy=DTypePolicy.full_precision())
    state = create_train_state(model, jax.random.PRNGKey(0),
                               input_shape=(1, 64, 64, 3), lr=1e-3)
    state = set_learning_rate(state, 1e-5)
    got = float(state.opt_state.hyperparams["learning_rate"])
    assert abs(got - 1e-5) < 1e-9  # stored as f32


def test_fused_step_matches_plain_step(rng):
    """VERDICT r4 item 6: the plain ``make_train_step`` (compiled by the
    sharding/checkpoint tests) must stay update-equivalent to the shipped
    ``make_fused_train_step`` when the fused step's extras are disabled
    (no jitter/noise/flip/rot, f32, jnp chain, scan_steps=1). The only
    intended difference is the fused step's in-jit uint8 -> normalized
    conversion, replicated here on the host for the plain batch. Fails if
    either step's math drifts from the other."""
    from lighthand_tpu.ops.color import normalize_imagenet
    from lighthand_tpu.train.step import make_fused_train_step

    model = get_model("resnet18", policy=DTypePolicy.full_precision())
    imgs_u8 = rng.integers(0, 256, size=(4, 64, 64, 3)).astype(np.uint8)
    joints = rng.uniform(8, 56, size=(4, 21, 2)).astype(np.float32)

    plain_state = create_train_state(model, jax.random.PRNGKey(0),
                                     input_shape=(1, 64, 64, 3), lr=1e-3)
    fused_state = create_train_state(model, jax.random.PRNGKey(0),
                                     input_shape=(1, 64, 64, 3), lr=1e-3)

    plain = make_train_step(heatmap_size=16, stride=4.0)
    fused = make_fused_train_step(heatmap_size=16, stride=4.0,
                                  jitter=False, scan_steps=1,
                                  compute_dtype=jnp.float32,
                                  use_pallas_aug=False)

    img_f32 = normalize_imagenet(
        jnp.asarray(imgs_u8).astype(jnp.float32) / 255.0)
    plain_batch = {"image": img_f32, "joints": jnp.asarray(joints)}
    fused_batch = {"image_u8": jnp.asarray(imgs_u8),
                   "joints": jnp.asarray(joints),
                   "aug_enabled": jnp.zeros(4, jnp.float32)}

    # Multi-step loss trajectory on the same batch: any semantic drift
    # (targets, normalize, loss, optimizer wiring) changes the loss within
    # a step or two, while equal math stays at f32-noise scale. A single
    # Adam step can't discriminate via params — its update is bounded by
    # lr regardless of how wrong the gradient is, and last-ulp input
    # differences (in-jit vs host normalize) flip near-zero updates.
    # rtol grows with step: f32 noise (last-ulp input differences between
    # the in-jit and host normalize) compounds ~10x per Adam step; semantic
    # drift shows up orders of magnitude above these bounds.
    for i, rtol in enumerate((1e-6, 1e-4, 1e-3)):
        plain_state, pm = plain(plain_state, plain_batch)
        fused_state, fm = fused(fused_state, jax.random.PRNGKey(7 + i),
                                fused_batch)
        np.testing.assert_allclose(float(pm["loss"]), float(fm["loss"]),
                                   rtol=rtol, err_msg=f"step {i}")

    # params stay within Adam-noise of each other: a last-ulp gradient
    # difference can flip a whole update, so per-element divergence is
    # bounded by 2*steps*lr = 6e-3 for IDENTICAL math; a wrong lr or
    # optimizer wiring produces step-size-scale diffs above the bound
    flat_p = jax.tree_util.tree_leaves_with_path(plain_state.params)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(fused_state.params))
    for path, leaf in flat_p:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_f[path]),
            rtol=0, atol=7e-3, err_msg=str(path))
    flat_bs = jax.tree_util.tree_leaves_with_path(plain_state.batch_stats)
    flat_bf = dict(jax.tree_util.tree_leaves_with_path(
        fused_state.batch_stats))
    # batch_stats shift with the (Adam-noise-divergent) params, so only a
    # coarse bound is stable; it still fails hard if either step stops
    # threading the mutated stats (running means then stay at init, a
    # ~0.05-1.0 difference after 3 steps)
    for path, leaf in flat_bs:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_bf[path]),
            rtol=5e-2, atol=1e-2, err_msg=str(path))
