"""Head-to-head accuracy-parity driver: train the REFERENCE's PyTorch model
on the same deterministic synthetic LightHand tree the JAX framework trains
on, and score it with the same decode/metric math.

This RUNS (does not copy) the reference implementation: the model is
imported from /root/reference/src/modeling/simplebaseline/pose_resnet.py
(get_pose_net, :308-322), the loss is its proven reduction 0.5*MSE
(JointsMSELoss == 0.5*global-MSE, tests/test_metrics.py), Adam + cosine LR
like train.py:45-58. Heatmap targets, argmax decode and EPE/PCK come from
lighthand_tpu.ops (on CPU), so BOTH frameworks see byte-identical targets
and metric definitions — the comparison isolates model/optimizer/training
dynamics.

The reference cannot be run unmodified in this image (its datasets need
torchvision, which is not installed; device='cuda' is hard-coded in
pre_argparser.py:19 and there is no GPU), hence this driver.

Counterpart: tools/parity_ours.py. Results: PARITY_RESULTS.md.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import math
import sys

sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
import time
from types import SimpleNamespace

import numpy as np

REF_POSE_RESNET = "/root/reference/src/modeling/simplebaseline/pose_resnet.py"
REF_POSE_HRNET = "/root/reference/src/modeling/hrnet/pose_hrnet.py"


def _load_module(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def load_reference_pose_net(num_layers: int, num_joints: int):
    mod = _load_module(REF_POSE_RESNET, "ref_pose_resnet")
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


def load_reference_hrnet(width: int, num_joints: int):
    """Reference PoseHighResolutionNet (run in place) with the cfg.yaml
    stage structure (src/modeling/hrnet/config/cfg.yaml:52-90) at base
    width ``width`` — the same topology family as get_model('hrnet_wN')."""
    mod = _load_module(REF_POSE_HRNET, "ref_pose_hrnet")

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


def load_reference_model(name: str, num_joints: int = 21):
    """name: 'resnetN' or 'hrnet_wN' (mirrors models.get_model)."""
    if name.startswith("resnet"):
        return load_reference_pose_net(int(name[len("resnet"):]), num_joints)
    if name.startswith("hrnet_w"):
        return load_reference_hrnet(int(name[len("hrnet_w"):]), num_joints)
    raise ValueError(f"unknown model {name!r}")


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--n", type=int, default=2000)
    p.add_argument("--n-val", type=int, default=512)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--layers", type=int, default=18)
    p.add_argument("--model", default=None,
                   help="resnetN | hrnet_wN (overrides --layers)")
    p.add_argument("--seed", type=int, default=9001)
    p.add_argument("--out", default="parity_torch.json")
    a = p.parse_args(argv)
    model_name = a.model or f"resnet{a.layers}"

    import torch

    # force-cpu jax for the shared target/metric math (before any devices())
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from lighthand_tpu.data.lighthand import (
        LightHandDataset,
        LightHandValSet,
    )
    from lighthand_tpu.ops.decode import get_max_preds
    from lighthand_tpu.ops.heatmap import generate_target_batch
    from lighthand_tpu.ops.metrics import epe_train, pck_2d

    torch.manual_seed(a.seed)
    np.random.seed(a.seed)

    size = a.size
    hm = size // 4
    stride = 4.0
    train_ds = LightHandDataset(a.data_root, "train", num_our=a.n,
                                ratio_of_aug=0.0, image_size=size)
    val_ds = LightHandValSet(a.data_root, "eval", image_size=size)
    n_val = min(a.n_val, len(val_ds))

    def load_block(ds, indices):
        imgs, joints = [], []
        for i in indices:
            s = ds[int(i)]
            imgs.append(s.image)
            joints.append(s.joints)
        x = np.stack(imgs).astype(np.float32) / 255.0
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        return (np.transpose(x, (0, 3, 1, 2)),
                np.stack(joints).astype(np.float32))

    model = load_reference_model(model_name, 21)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=a.lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=a.epochs)

    # preload the val block once (targets not needed; metrics on decode)
    val_x, val_j = load_block(val_ds, range(n_val))

    def evaluate():
        model.eval()
        preds = []
        with torch.no_grad():
            for lo in range(0, n_val, a.bs):
                xb = torch.from_numpy(val_x[lo:lo + a.bs])
                preds.append(model(xb).numpy())
        model.train()
        hmaps = np.concatenate(preds)  # NCHW
        pj, _ = get_max_preds(jnp.asarray(hmaps))
        pj = np.asarray(pj) * stride
        epe_sum, epe_cnt = epe_train(jnp.asarray(pj), jnp.asarray(val_j))
        pck = float(pck_2d(jnp.asarray(pj), jnp.asarray(val_j), t=0.2,
                           threshold="proportion"))
        return float(epe_sum) / float(epe_cnt), pck

    rng = np.random.default_rng(a.seed)
    history = []
    n_batches = len(train_ds) // a.bs
    for epoch in range(a.epochs):
        order = rng.permutation(len(train_ds))
        t0 = time.time()
        ep_loss = 0.0
        for b in range(n_batches):
            idx = order[b * a.bs:(b + 1) * a.bs]
            xb, jb = load_block(train_ds, idx)
            tgt = np.asarray(generate_target_batch(
                jnp.asarray(jb), hm, stride, 2.0))
            xb_t = torch.from_numpy(xb)
            tgt_t = torch.from_numpy(tgt)
            pred = model(xb_t)
            loss = 0.5 * torch.mean((pred - tgt_t) ** 2)
            opt.zero_grad()
            loss.backward()
            opt.step()
            ep_loss += float(loss)
        sched.step()
        epe, pck = evaluate()
        ips = n_batches * a.bs / (time.time() - t0)
        history.append({"epoch": epoch, "train_loss": ep_loss / n_batches,
                        "val_epe_px": epe, "val_pck_02": pck,
                        "img_per_sec": ips})
        print(f"[torch-ref] epoch {epoch}: loss={ep_loss / n_batches:.6f} "
              f"EPE={epe:.3f}px PCK@0.2={pck * 100:.2f}% ({ips:.1f} img/s)",
              flush=True)

    result = {
        "framework": f"torch-reference ({model_name} run in-place)",
        "model": model_name,
        "config": vars(a),
        "final": history[-1],
        "best_epe_px": min(h["val_epe_px"] for h in history),
        "best_pck_02": max(h["val_pck_02"] for h in history),
        "history": history,
    }
    with open(a.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in
                      ("final", "best_epe_px", "best_pck_02")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
