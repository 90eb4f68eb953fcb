"""Capture and summarize an XLA profiler trace of the benchmark train step.

Runs the bench workload (HRNet-W32@256 bs128 fused step by default) under
``train/profiler.trace``, then parses the trace protobuf/JSON that
jax.profiler writes and prints the top-k ops by total device time — the
evidence base for kernel-level optimization (VERDICT round-1 item 2).

Usage:
    python tools/profile_step.py [--model hrnet_w32] [--batch 128]
        [--out /tmp/lh_trace]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_workload(model_name: str, batch: int, size: int, out_dir: str,
                 steps: int = 6, precision: str = "bf16",
                 scan_steps: int = 4) -> None:
    import jax
    import numpy as np

    from lighthand_tpu.core.cache import enable_compilation_cache

    from lighthand_tpu.train.watchdog import device_reachability_gate

    device_reachability_gate(who="profile_step")
    enable_compilation_cache()
    from lighthand_tpu.core.dtypes import DTypePolicy
    from lighthand_tpu.core.prng import cpu_prng_key, host_split
    from lighthand_tpu.core.mesh import (
        MeshSpec,
        create_mesh,
        replicated_sharding,
    )
    from lighthand_tpu.models import get_model
    from lighthand_tpu.train import create_train_state
    from lighthand_tpu.train.profiler import trace
    from lighthand_tpu.train.step import make_fused_train_step

    mesh = create_mesh(MeshSpec())
    policy = (DTypePolicy.all_bf16() if precision == "all_bf16"
              else DTypePolicy())
    model = get_model(model_name, policy=policy)
    state = create_train_state(model, cpu_prng_key(0),
                               input_shape=(1, size, size, 3), lr=1e-3)
    state = jax.device_put(state, replicated_sharding(mesh))
    # scan_steps=4 matches the bench headline dispatch exactly (and reuses
    # its compilation cache entry — the scan1 graph is a separate
    # minutes-long remote compile for no extra information).
    step = make_fused_train_step(heatmap_size=size // 4, stride=4.0,
                                 jitter=True, scan_steps=scan_steps)

    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(0)
    lead = (scan_steps, batch) if scan_steps > 1 else (batch,)

    def shard(x):
        spec = (P(None, "data", *([None] * (x.ndim - 2)))
                if scan_steps > 1 else P("data", *([None] * (x.ndim - 1))))
        return jax.device_put(x, NamedSharding(mesh, spec))

    batch_d = {
        "image_u8": shard(rng.integers(0, 255, size=lead + (size, size, 3),
                                       dtype=np.uint8)),
        "joints": shard(rng.uniform(16, size - 16, size=lead + (21, 2))
                        .astype(np.float32)),
        "aug_enabled": shard(np.ones(lead, np.float32)),
        "noise_enabled": shard(np.zeros(lead, np.float32)),
    }
    key = cpu_prng_key(1)
    for _ in range(3):  # warmup/compile outside the trace
        key, sub = host_split(key)
        state, m = step(state, sub, batch_d)
    jax.block_until_ready(m["loss"])

    with trace(out_dir):
        for _ in range(steps):
            key, sub = host_split(key)
            state, m = step(state, sub, batch_d)
        jax.block_until_ready(m["loss"])


def _roofline(events: list, device_pids: set) -> None:
    """Per-hlo_category roofline from the trace's own op metadata.

    XLA's trace events carry ``bytes_accessed`` / ``model_flops`` /
    ``hlo_category`` / ``source`` per op instance, which turns the trace
    into a measured roofline: time + bytes -> achieved bandwidth per
    category, plus a source-line attribution table (which model line each
    millisecond belongs to). ``while`` aggregate lanes are excluded (inner
    ops are counted directly); shares are of inner-op time."""
    from collections import defaultdict as dd
    cat_d, cat_b, cat_f, cat_n = dd(float), dd(float), dd(float), dd(int)
    src_d, src_n = dd(float), dd(int)
    nwhile, while_dur = 0, 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e or "args" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        a = e["args"]
        cat = a.get("hlo_category")
        if cat is None:
            continue
        if cat == "while":
            nwhile += 1
            while_dur += e["dur"]
            continue
        cat_d[cat] += e["dur"]
        cat_n[cat] += 1
        cat_b[cat] += float(a.get("bytes_accessed", 0) or 0)
        cat_f[cat] += float(a.get("model_flops", 0) or 0)
        src = a.get("source", "?")
        src_d[src] += e["dur"]
        src_n[src] += 1
    steps = max(nwhile, 1)
    tot = sum(cat_d.values())
    if not tot:
        return
    if nwhile:
        print(f"\nroofline: {nwhile} scanned dispatches, "
              f"{while_dur / nwhile / 1e3:.1f} ms each")
    print(f"per-category (per dispatch; inner-op total "
          f"{tot / steps / 1e3:.1f} ms):")
    print(f"{'category':28s} {'ms':>8s} {'share':>6s} {'GB':>8s} "
          f"{'GB/s':>7s} {'TFLOP/s':>8s} {'count':>6s}")
    for c, d in sorted(cat_d.items(), key=lambda kv: -kv[1]):
        ms = d / steps / 1e3
        if ms < 0.05:
            continue
        gb = cat_b[c] / steps / 1e9
        bw = gb / (ms / 1e3)
        tf = cat_f[c] / steps / 1e12 / (ms / 1e3)
        print(f"{c:28s} {ms:8.2f} {100 * d / tot:5.1f}% {gb:8.2f} "
              f"{bw:7.0f} {tf:8.1f} {cat_n[c] // steps:6d}")
    print("top source lines:")
    for s, d in sorted(src_d.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {d / steps / 1e3:8.2f} ms  x{src_n[s] // steps:<6d} {s}")


def summarize(out_dir: str, top_k: int = 30, per_op: bool = False) -> list:
    """Parse trace.json.gz event durations; rank ops by total device time.

    ``per_op`` additionally ranks UNcollapsed instance names (fusion.123,
    not fusion) — the attribution view: category totals say "loop fusions
    are 15 ms", the instance view says WHICH fusions, so they can be
    matched to source ops in the HLO dump (tools/analyze_hlo.py)."""
    paths = glob.glob(os.path.join(out_dir, "plugins", "profile", "*",
                                   "*.trace.json.gz"))
    if not paths:
        print(f"no trace found under {out_dir}", file=sys.stderr)
        return []
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # device lanes: pids whose process name mentions TPU/device
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {pid for pid, n in proc_names.items()
                   if "TPU" in n or "/device" in n.lower()}

    import re

    totals = defaultdict(float)
    counts = defaultdict(int)
    instances = defaultdict(float)
    step_time = 0.0
    n_steps = 0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        if name.startswith("jit_"):
            step_time += e["dur"]
            n_steps += 1
            continue
        if re.fullmatch(r"\d+", name):
            continue  # per-step aggregate lanes
        # collapse instances: fusion.123 -> fusion, %convolution.5 -> convolution
        cat = re.sub(r"[.\-]\d+$", "", name.lstrip("%"))
        totals[cat] += e["dur"]
        counts[cat] += 1
        if per_op:
            instances[name.lstrip("%")] += e["dur"]

    ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:top_k]
    _roofline(events, device_pids)
    total = sum(totals.values())
    print(f"trace: {path}")
    if n_steps:
        print(f"step time: {step_time / n_steps / 1e3:.2f} ms/step "
              f"x{n_steps}; leaf-op time {total / 1e3:.2f} ms total "
              f"({total / step_time * 100:.1f}% of step lanes)")
    rows = []
    for name, dur in ranked:
        pct = 100.0 * dur / total if total else 0.0
        rows.append({"op": name, "ms": dur / 1e3, "pct": pct,
                     "count": counts[name]})
        print(f"{pct:5.1f}%  {dur / 1e3:9.2f} ms  x{counts[name]:<5d} {name}")
    if per_op:
        print("\nper-instance (uncollapsed) top ops:")
        for name, dur in sorted(instances.items(),
                                key=lambda kv: -kv[1])[:top_k]:
            pct = 100.0 * dur / total if total else 0.0
            print(f"{pct:5.1f}%  {dur / 1e3:9.2f} ms  {name}")
    return rows


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="hrnet_w32")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--scan", type=int, default=4)
    p.add_argument("--precision", default="bf16")
    p.add_argument("--out", default="/tmp/lh_trace")
    p.add_argument("--parse-only", action="store_true")
    p.add_argument("--per-op", action="store_true",
                   help="also rank uncollapsed op instances (attribution)")
    a = p.parse_args(argv)
    if not a.parse_only:
        run_workload(a.model, a.batch, a.size, a.out, a.steps, a.precision,
                     a.scan)
    summarize(a.out, per_op=a.per_op)
    return 0


if __name__ == "__main__":
    sys.exit(main())
