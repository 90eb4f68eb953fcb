"""Probe the TPU tunnel: exit 0 if a tiny transfer round-trips, 86 if wedged.

Usage: python tools/probe_tunnel.py [timeout_s]
Writes a status line to stdout either way. Safe to run repeatedly; uses the
same watchdog-based fail-fast as bench.py's reachability gate so a wedged
claim cannot hang the caller.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    timeout_s = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    from lighthand_tpu.train.watchdog import STALL_EXIT_CODE, StallWatchdog

    t0 = time.time()

    def _stall(stalled: float) -> None:
        print(f"probe: device unreachable after {stalled:.0f}s "
              f"({time.strftime('%F %T')})", flush=True)
        os._exit(STALL_EXIT_CODE)

    wd = StallWatchdog(timeout_s, on_stall=_stall, poll_s=2.0)
    wd.start()
    wd.heartbeat()
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    jnp.ones((8, 8)).block_until_ready()
    wd.stop()
    print(f"probe: OK {dev.platform} round-trip in {time.time() - t0:.1f}s "
          f"({time.strftime('%F %T')})", flush=True)


if __name__ == "__main__":
    main()
