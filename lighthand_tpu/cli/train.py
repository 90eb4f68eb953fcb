"""Training CLI — preserves the reference recipe surface
(src/tools/train.py): e.g.

    python -m lighthand_tpu.cli.train --root hrnet/frei --name 2d \
        --epoch 100 --count 30 --batch_size 32 --lr 0.001 --reset --yes

plus TPU extensions: --mesh-data/--mesh-model, --precision, --synthetic.
"""

from __future__ import annotations

import sys

from lighthand_tpu.config import parse_args
from lighthand_tpu.train.loop import train_from_config


def main(argv=None) -> int:
    # before any backend query: multi-host runs need the global device set
    from lighthand_tpu.core.dist import maybe_initialize_distributed

    maybe_initialize_distributed()
    cfg = parse_args(argv, phase="train")

    # wedged-tunnel hardening: the stall watchdog only arms after the
    # first completed dispatch, so a tunnel that is ALREADY dead would
    # hang the run before any heartbeat — probe with a tiny transfer
    # first (after parse_args, so --platform overrides apply)
    from lighthand_tpu.train.watchdog import device_reachability_gate

    device_reachability_gate(who="train")
    result = train_from_config(cfg)
    print(
        f"done: train_loss={result.train_loss:.6f} "
        f"val_loss={result.val_loss:.6f} pck={result.pck:.2f}% "
        f"epe={result.epe_px:.2f}px "
        f"throughput={result.images_per_sec:.1f} img/s"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
