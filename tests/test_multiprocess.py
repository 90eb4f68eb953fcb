"""Multi-PROCESS (multi-host-style) smoke test on the CPU backend.

Launches two real OS processes that join a jax.distributed coordination
service (core/dist.py env contract), build a 2-device global mesh (one CPU
device each), drive the process-sharded Loader, and aggregate with
all_gather_metrics — the paths a TPU pod run exercises (SURVEY.md
section 5.8). Skipped if this jax build lacks multi-process CPU
collectives."""

import os
import socket
import subprocess
import sys

import pytest

CHILD = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon,cpu

from lighthand_tpu.core.dist import maybe_initialize_distributed
assert maybe_initialize_distributed(), "env contract not detected"
assert jax.process_count() == 2, jax.process_count()

import numpy as np
import jax.numpy as jnp
from lighthand_tpu.core.mesh import MeshSpec, create_mesh
from lighthand_tpu.data.pipeline import Loader
from lighthand_tpu.data.synthetic import SyntheticHands
from lighthand_tpu.parallel import all_gather_metrics

mesh = create_mesh(MeshSpec(data=2, model=1))
src = SyntheticHands(length=8, size=32)
loader = Loader(src, batch_size=4, mesh=mesh, shuffle=False, num_workers=1)
batch = next(iter(loader))
assert batch["image_u8"].shape == (4, 32, 32, 3), batch["image_u8"].shape

# global reduction over the process-sharded batch == host-side global mean
got = float(jax.jit(lambda x: jnp.mean(x.astype(jnp.float32)))(
    batch["image_u8"]))
want = float(np.mean(np.stack([src[i].image for i in range(4)])
                     .astype(np.float32)))
assert abs(got - want) < 1e-3, (got, want)

# eval-metric aggregation: every host sees every process's values
gathered = all_gather_metrics({"v": np.asarray([jax.process_index()],
                                               np.int32)})
flat = sorted(np.asarray(gathered["v"]).ravel().tolist())
assert flat == [0, 1], flat
print(f"proc {jax.process_index()}: OK")
"""


CHILD_RAGGED = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon,cpu

from lighthand_tpu.core.dist import maybe_initialize_distributed
assert maybe_initialize_distributed(), "env contract not detected"

import numpy as np
import jax.numpy as jnp
from lighthand_tpu.core.mesh import MeshSpec, create_mesh
from lighthand_tpu.data.pipeline import Loader
from lighthand_tpu.data.synthetic import SyntheticHands

# len % (batch * nproc) != 0: 10 samples, global batch 8, 2 procs ->
# one full batch + a ragged tail of 2 padded to 8; the pad slices across
# processes. Every REAL sample must count exactly once globally.
mesh = create_mesh(MeshSpec(data=2, model=1))
src = SyntheticHands(length=10, size=32)
loader = Loader(src, batch_size=8, mesh=mesh, shuffle=False, num_workers=1,
                drop_last=False)

@jax.jit
def weighted(images, valid):
    per = jnp.mean(images.astype(jnp.float32), axis=(1, 2, 3))
    w = valid.astype(jnp.float32)
    return jnp.sum(per * w), jnp.sum(w)

tot, cnt = 0.0, 0.0
for batch in loader:
    s, c = weighted(batch["image_u8"], batch["valid"])
    tot += float(s); cnt += float(c)

want = sum(float(np.mean(src[i].image.astype(np.float32)))
           for i in range(10))
assert cnt == 10.0, cnt
assert abs(tot - want) < 1e-2 * max(abs(want), 1.0), (tot, want)
print(f"proc {jax.process_index()}: RAGGED OK")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_two_procs(child_src: str) -> str:
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update({
            "LIGHTHAND_COORDINATOR": f"127.0.0.1:{port}",
            "LIGHTHAND_NUM_PROCESSES": "2",
            "LIGHTHAND_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", child_src], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process children hung")
    joined = "\n---\n".join(outs)
    if any(p.returncode != 0 for p in procs):
        lowered = joined.lower()
        if ("collective" in lowered or "not implemented" in lowered
                or "unimplemented" in lowered or "cross-host" in lowered):
            pytest.skip(
                f"jax build lacks multi-process CPU collectives:\n{joined}")
        pytest.fail(joined)
    return joined


def test_two_process_cpu_mesh(tmp_path):
    joined = _run_two_procs(CHILD)
    assert "proc 0: OK" in joined and "proc 1: OK" in joined, joined


def test_two_process_ragged_tail(tmp_path):
    """drop_last=False with len % (batch*nproc) != 0: the padded tail is
    sliced across processes; global (sum, count) must equal the
    single-process ground truth — every real sample exactly once."""
    joined = _run_two_procs(CHILD_RAGGED)
    assert ("proc 0: RAGGED OK" in joined
            and "proc 1: RAGGED OK" in joined), joined
