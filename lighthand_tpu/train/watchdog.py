"""Stall watchdog: bound the damage of a wedged device call.

Failure mode this guards (observed on the single-tenant remote-tunnel
TPU; SURVEY.md §5.3 failure detection): a dispatch blocks forever in a
tcp recv mid-transfer. The training process then sleeps holding the
single-tenant device claim, and the claim can stay stuck for over an
hour even after the process is killed — so the earlier the process
exits, the earlier the chip is usable again. A Python thread cannot
interrupt a blocked PJRT call; the only safe remedy is a loud log and
``os._exit`` once no training progress has been observed for the
timeout. The reference has no equivalent (its failure handling is
"restart the job by hand"); this is TPU-tunnel operational hardening.

Usage::

    wd = StallWatchdog(timeout_s=900, logger=logger)
    wd.start()
    try:
        for step in ...:
            ...  # blocking device work
            wd.heartbeat()
    finally:
        wd.stop()

The watchdog only arms at the first ``heartbeat()`` — the first
dispatch of a process includes the (remote, possibly minutes-long)
compile, which must not count against the stall timeout.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Callable, Optional

STALL_EXIT_CODE = 86  # distinct from timeout(1)'s 124 and SIGKILL's 137


class StallWatchdog:
    """Exit the process if ``heartbeat()`` stops arriving.

    ``on_stall`` (tests) replaces the default log-and-``os._exit``.
    ``timeout_s <= 0`` disables the watchdog entirely (all methods
    become no-ops), so callers can wire it unconditionally.
    """

    def __init__(self, timeout_s: float, logger=None,
                 on_stall: Optional[Callable[[float], None]] = None,
                 poll_s: float = 1.0):
        self.timeout_s = float(timeout_s)
        self.logger = logger
        self.on_stall = on_stall
        self.poll_s = poll_s
        self._last: Optional[float] = None  # None until armed
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    @property
    def enabled(self) -> bool:
        return self.timeout_s > 0

    def start(self) -> "StallWatchdog":
        if self.enabled and self._thread is None:
            self._thread = threading.Thread(
                target=self._run, name="stall-watchdog", daemon=True)
            self._thread.start()
        return self

    def heartbeat(self) -> None:
        if self.enabled:
            with self._lock:
                self._last = time.monotonic()

    def disarm(self) -> None:
        """Suspend the stall clock until the next ``heartbeat()``.

        Call immediately before a dispatch that is known to trigger a
        first-use compile (e.g. the first eval_step of a run): remote
        compiles take 5-15 min with no progress signal, and must not
        count against the stall timeout any more than the very first
        dispatch of the process does."""
        if self.enabled:
            with self._lock:
                self._last = None

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None

    # internal -------------------------------------------------------------

    def _run(self) -> None:
        while not self._stop.wait(self.poll_s):
            with self._lock:
                last = self._last
            if last is None:  # not armed yet (first compile in flight)
                continue
            stalled = time.monotonic() - last
            if stalled > self.timeout_s:
                self._fire(stalled)
                return

    def _fire(self, stalled: float) -> None:
        msg = (f"STALL WATCHDOG: no training progress for {stalled:.0f}s "
               f"(> {self.timeout_s:.0f}s) — a device call is likely "
               f"wedged (tunnel tcp recv). Exiting with code "
               f"{STALL_EXIT_CODE} to release the device claim; resume "
               f"from checkpoint-good.")
        if self.on_stall is not None:
            self.on_stall(stalled)
            return
        if self.logger is not None:
            try:
                self.logger.critical(msg)
            except Exception:
                pass
        print(msg, flush=True)
        os._exit(STALL_EXIT_CODE)


def device_reachability_gate(timeout_s: float = 300.0, who: str = "job",
                             on_stall: Optional[Callable[[float], None]] = None,
                             poll_s: float = 5.0,
                             probe: Optional[Callable[[], None]] = None) -> None:
    """Fail fast if the device tunnel is wedged.

    A dead single-tenant claim can block a first transfer forever
    (observed >4 h); every TPU-touching entry point (bench.py, cli.eval,
    tools/parity_*) must round-trip a tiny transfer through this gate
    before dispatching real work, so a wedged tunnel costs minutes, not
    the caller's whole time budget. Exits ``STALL_EXIT_CODE`` (86) on
    stall unless ``on_stall`` (tests) is given."""
    import sys

    def _default_stall(stalled: float) -> None:
        print(f"{who}: device unreachable after {stalled:.0f}s "
              f"(tunnel wedged); exiting {STALL_EXIT_CODE}",
              file=sys.stderr, flush=True)
        os._exit(STALL_EXIT_CODE)

    if probe is None:  # ``probe`` is injectable for deterministic tests
        def probe() -> None:
            import jax.numpy as jnp

            jnp.ones((8, 8)).block_until_ready()

    wd = StallWatchdog(timeout_s, on_stall=on_stall or _default_stall,
                       poll_s=poll_s)
    wd.start()
    wd.heartbeat()  # arm: the clock runs over the probe itself
    probe()
    wd.stop()


def host_rss_gb() -> float:
    """Resident set size of this process in GB (0.0 if unreadable)."""
    try:
        with open("/proc/self/statm") as f:
            return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 1e9
    except (OSError, ValueError, IndexError):  # pragma: no cover
        return 0.0


def resolve_rss_limit_gb(limit_gb: float) -> float:
    """-1 = auto (80% of MemTotal), 0 = disabled, >0 = explicit GB."""
    if limit_gb >= 0:
        return limit_gb
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    return int(line.split()[1]) * 1024 / 1e9 * 0.8
    except (OSError, ValueError, IndexError):  # pragma: no cover
        pass
    return 0.0


def check_rss_limit(limit_gb: float, logger=None,
                    on_exceed: Optional[Callable[[float, float], None]] = None
                    ) -> float:
    """Exit ``STALL_EXIT_CODE`` when host RSS crosses the limit.

    The remote-tunnel client leaks per-transfer buffers (~3 GB per
    8k-image epoch observed); a long run eventually exhausts host RAM
    and dies with SIGKILL(137), which retry harnesses keyed on exit 86
    (tools/tpu_queue.sh) do NOT resume. Calling this at every epoch
    boundary — right after the checkpoint decision — converts the OOM
    into the same clean exit-86 / resume-from-checkpoint-good protocol
    as a wedge — losing at most the epochs since the last best
    checkpoint, same as the wedge-retry contract (resume is from
    checkpoint-good, the last val-loss improvement).
    ``on_exceed(rss, limit)`` (tests)
    replaces the default log-and-``os._exit``. Returns the resolved
    limit."""
    limit = resolve_rss_limit_gb(limit_gb)
    if limit <= 0:
        return limit
    rss = host_rss_gb()
    if rss < limit:
        return limit
    if on_exceed is not None:
        on_exceed(rss, limit)
        return limit
    msg = (f"RSS LIMIT: host rss {rss:.1f} GB >= limit {limit:.1f} GB "
           f"(tunnel-client buffer growth). Exiting with code "
           f"{STALL_EXIT_CODE} at the epoch boundary; resume from "
           f"checkpoint-good.")
    if logger is not None:
        try:
            logger.critical(msg)
        except Exception:
            pass
    print(msg, flush=True)
    os._exit(STALL_EXIT_CODE)
    return limit  # pragma: no cover
