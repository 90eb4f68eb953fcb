"""Head-to-head accuracy-parity driver, JAX side (counterpart of
tools/parity_torch.py): train this framework's PoseResNet through the real
Trainer on the same synthetic LightHand tree, same image size / batch /
epochs / lr, aug off, and report the same val metrics (EPE px via
epe_train semantics, PCK@0.2 proportion — both computed inside
train/step.py:make_eval_step).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--n", type=int, default=2000)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--layers", type=int, default=18)
    p.add_argument("--model", default=None,
                   help="resnetN | hrnet_wN (overrides --layers)")
    p.add_argument("--n-val", type=int, default=None,
                   help="evaluate only the first N val samples (matches "
                        "parity_torch's --n-val 512 protocol exactly)")
    p.add_argument("--seed", type=int, default=9001)
    p.add_argument("--init-from-torch", action="store_true",
                   help="replace the Flax init with a transplant of the "
                        "reference torch model's init at torch.manual_seed("
                        "seed) — removes init-draw variance from the "
                        "head-to-head (utils/torch_port.py)")
    p.add_argument("--precision", default="f32")
    p.add_argument("--out", default="parity_ours.json")
    p.add_argument("--run-dir", default="output/parity_ours")
    a = p.parse_args(argv)

    from lighthand_tpu.config import Config
    from lighthand_tpu.train.loop import Trainer

    model_name = a.model or f"resnet{a.layers}"
    cfg = Config(name=f"{model_name}/ours/parity")
    cfg.model.name = model_name
    cfg.model.precision = a.precision
    cfg.data.dataset = "ours"
    cfg.data.dataset_root = a.data_root
    cfg.data.image_size = a.size
    cfg.data.heatmap_size = a.size // 4
    cfg.data.batch_size = a.bs
    cfg.data.num_our = a.n
    cfg.data.ratio_of_aug = 0.0      # torch side can't jitter (no torchvision)
    cfg.train.epochs = a.epochs
    cfg.train.seed = a.seed
    cfg.data.shuffle_seed = a.seed
    cfg.train.lr = a.lr
    cfg.train.early_stop_count = 10**9
    cfg.train.visualize = False
    cfg.output_dir = a.run_dir
    cfg.tensorboard_dir = os.path.join(a.run_dir, "tb")

    # the Trainer's stall watchdog only arms after the first completed
    # dispatch; an already-wedged tunnel must fail fast here instead
    from lighthand_tpu.train.watchdog import device_reachability_gate

    device_reachability_gate(who="parity_ours")

    trainer = Trainer(cfg)
    if a.init_from_torch:
        import numpy as _np
        import torch

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from parity_torch import load_reference_model

        from lighthand_tpu.utils.torch_port import (
            pose_hrnet_from_torch,
            pose_resnet_from_torch,
        )

        torch.manual_seed(a.seed)
        tm = load_reference_model(model_name, 21)
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        if model_name.startswith("hrnet_w"):
            from lighthand_tpu.models.hrnet import HRNetCfg
            variables = pose_hrnet_from_torch(
                sd, cfg=HRNetCfg.from_width(int(model_name[len("hrnet_w"):])))
        else:
            variables = pose_resnet_from_torch(
                sd, num_layers=int(model_name[len("resnet"):]))
        import jax

        def _cast_like(new, old):
            return jax.tree.map(
                lambda n, o: _np.asarray(n, dtype=o.dtype), new, old)

        trainer.state = trainer.state.replace(
            params=_cast_like(variables["params"], trainer.state.params),
            batch_stats=_cast_like(variables["batch_stats"],
                                   trainer.state.batch_stats))
        print("[ours] initialized from torch transplant "
              f"(manual_seed={a.seed})", flush=True)
    if a.n_val is not None:
        from lighthand_tpu.data.records import SubsetSource
        trainer.val_src = SubsetSource(
            trainer.val_src, list(range(min(a.n_val, len(trainer.val_src)))))
    train_loader, val_loader = trainer.make_loaders()
    history = []
    from lighthand_tpu.train.state import cosine_lr, set_learning_rate

    for epoch in range(a.epochs):
        trainer.state = set_learning_rate(
            trainer.state, cosine_lr(a.lr, epoch, a.epochs))
        train_loss, ips = trainer.run_train_epoch(train_loader, epoch)
        val_loss, pck_pct, epe_px = trainer.run_valid_epoch(val_loader, epoch)
        history.append({"epoch": epoch, "train_loss": train_loss,
                        "val_epe_px": epe_px, "val_pck_02": pck_pct / 100.0,
                        "img_per_sec": ips})
        print(f"[ours] epoch {epoch}: loss={train_loss:.6f} "
              f"EPE={epe_px:.3f}px PCK@0.2={pck_pct:.2f}% ({ips:.1f} img/s)",
              flush=True)

    result = {
        "framework": "lighthand_tpu (this repo)",
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
