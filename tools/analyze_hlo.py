"""Dump + analyze the optimized HLO of the bench train step: find every
layout copy/transpose/bitcast-convert with its shapes and byte volume, and
rank loop fusions by output bytes — the per-copy evidence VERDICT round-2
item 2 asks for.

Usage:
    python tools/analyze_hlo.py [--model hrnet_w32] [--batch 128]
        [--scan 4] [--save /tmp/step.hlo.txt]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "u8": 1, "s8": 1,
                "pred": 1, "f16": 2, "s64": 8, "u64": 8, "f64": 8}


def shape_bytes(shape_str: str) -> int:
    """'bf16[128,3,256,256]{...}' -> byte count (ignores padding)."""
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def build_step(model_name: str, batch: int, size: int, scan_steps: int):
    import jax
    import numpy as np

    from lighthand_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    from lighthand_tpu.core.prng import cpu_prng_key
    from lighthand_tpu.core.mesh import (
        MeshSpec, create_mesh, replicated_sharding,
    )
    from lighthand_tpu.models import get_model
    from lighthand_tpu.train import create_train_state
    from lighthand_tpu.train.step import make_fused_train_step

    mesh = create_mesh(MeshSpec())
    model = get_model(model_name)
    state = create_train_state(model, cpu_prng_key(0),
                               input_shape=(1, size, size, 3), lr=1e-3)
    state = jax.device_put(state, replicated_sharding(mesh))
    step = make_fused_train_step(heatmap_size=size // 4, stride=4.0,
                                 jitter=True, scan_steps=scan_steps)
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(0)
    lead = (scan_steps, batch) if scan_steps > 1 else (batch,)

    def shard(x):
        spec = (P(None, "data", *([None] * (x.ndim - 2))) if scan_steps > 1
                else P("data", *([None] * (x.ndim - 1))))
        return jax.device_put(x, NamedSharding(mesh, spec))

    batch_d = {
        "image_u8": shard(rng.integers(0, 255, size=lead + (size, size, 3),
                                       dtype=np.uint8)),
        "joints": shard(rng.uniform(16, size - 16, size=lead + (21, 2))
                        .astype(np.float32)),
        "aug_enabled": shard(np.ones(lead, np.float32)),
        "noise_enabled": shard(np.zeros(lead, np.float32)),
    }
    return step, state, cpu_prng_key(1), batch_d


def analyze(text: str, top: int = 25) -> None:
    copies = []          # (bytes, line-summary)
    transposes = []
    fusion_kinds = defaultdict(int)
    for line in text.splitlines():
        ls = line.strip()
        m = re.match(r"%?([\w.\-]+) = (\S+) (copy|transpose)\((.*?)\)", ls)
        if m:
            name, shape, op, _args = m.groups()
            b = shape_bytes(shape)
            (copies if op == "copy" else transposes).append((b, ls[:180]))
        mk = re.search(r"fusion\(.*kind=(\w+)", ls)
        if mk:
            fusion_kinds[mk.group(1)] += 1
    for label, rows in (("copy", copies), ("transpose", transposes)):
        rows.sort(reverse=True)
        tot = sum(b for b, _ in rows)
        print(f"\n== {label}: {len(rows)} ops, {tot / 1e6:.1f} MB output "
              f"bytes total ==")
        for b, summary in rows[:top]:
            print(f"  {b / 1e6:9.2f} MB  {summary}")
    print(f"\nfusion kinds: {dict(fusion_kinds)}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="hrnet_w32")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--scan", type=int, default=4)
    p.add_argument("--save", default="/tmp/step.hlo.txt")
    p.add_argument("--parse-only", default=None,
                   help="analyze an existing HLO text file instead")
    a = p.parse_args(argv)

    if a.parse_only:
        with open(a.parse_only) as f:
            text = f.read()
    else:
        step, state, key, batch_d = build_step(a.model, a.batch, a.size,
                                               a.scan)
        compiled = step.lower(state, key, batch_d).compile()
        text = compiled.as_text()
        if a.save:
            with open(a.save, "w") as f:
                f.write(text)
            print(f"saved optimized HLO to {a.save} "
                  f"({len(text) / 1e6:.1f} MB)")
        costs = compiled.cost_analysis()
        cost = costs[0] if isinstance(costs, (list, tuple)) else costs
        if cost:
            print({k: round(v / 1e9, 2) for k, v in cost.items()
                   if k in ("flops", "bytes accessed")})
    analyze(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
