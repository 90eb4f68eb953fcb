"""Quantify TPU conv-precision noise on the transplanted HRNet forward.

Transplants reference torch weights into the Flax hrnet_wN, runs the same
input through (a) torch f32 on CPU, (b) TPU with default matmul precision
(bf16 multiplies, f32 accumulate), (c) TPU with HIGHEST (true f32), and
prints max|diff| of the heatmap logits — the evidence for whether the
head-to-head gap is framework numerics (VERDICT r2 #4 follow-up).

Usage: python tools/precision_probe.py [--model hrnet_w16] [--size 64]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="hrnet_w16")
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seed", type=int, default=9001)
    a = p.parse_args(argv)

    import numpy as np
    import torch

    from parity_torch import load_reference_model

    torch.manual_seed(a.seed)
    tm = load_reference_model(a.model, 21)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    rng = np.random.default_rng(0)
    x = rng.standard_normal((a.batch, a.size, a.size, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ref = ref.transpose(0, 2, 3, 1)  # NHWC to match flax

    import jax

    from lighthand_tpu.train.watchdog import device_reachability_gate

    device_reachability_gate(who="precision_probe")

    from lighthand_tpu.core.dtypes import DTypePolicy
    from lighthand_tpu.models import get_model
    from lighthand_tpu.models.hrnet import HRNetCfg
    from lighthand_tpu.utils.torch_port import pose_hrnet_from_torch

    variables = pose_hrnet_from_torch(
        sd, cfg=HRNetCfg.from_width(int(a.model[len("hrnet_w"):])))
    model = get_model(a.model, policy=DTypePolicy.full_precision())

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x, train=False)

    scale = float(np.abs(ref).max())
    for prec in ("default", "highest"):
        with jax.default_matmul_precision(prec):
            out = np.asarray(jax.jit(lambda v, x: model.apply(
                v, x, train=False))(variables, x))
        d = float(np.abs(out - ref).max())
        print(f"matmul_precision={prec}: max|logit diff| = {d:.3e} "
              f"(rel {d / scale:.3e})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
