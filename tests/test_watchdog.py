"""StallWatchdog (train/watchdog.py): fires only after heartbeats stop,
never before arming, and never after stop()."""

import threading
import time

from lighthand_tpu.train.watchdog import StallWatchdog


def test_fires_after_heartbeats_stop():
    fired = threading.Event()
    wd = StallWatchdog(timeout_s=0.3, poll_s=0.05,
                       on_stall=lambda s: fired.set())
    wd.start()
    try:
        for _ in range(4):  # healthy phase: regular progress
            wd.heartbeat()
            time.sleep(0.1)
            assert not fired.is_set()
        assert fired.wait(2.0)  # progress stops -> watchdog fires
    finally:
        wd.stop()


def test_does_not_fire_before_arming():
    """The first remote compile can take minutes; until the first
    heartbeat the watchdog must stay quiet no matter how long."""
    fired = threading.Event()
    wd = StallWatchdog(timeout_s=0.1, poll_s=0.02,
                       on_stall=lambda s: fired.set())
    wd.start()
    try:
        time.sleep(0.5)  # 5x the timeout with no heartbeat at all
        assert not fired.is_set()
        wd.heartbeat()  # arm
        assert fired.wait(2.0)
    finally:
        wd.stop()


def test_disarm_suspends_until_next_heartbeat():
    """First-use compiles (e.g. eval_step at the first validation
    boundary) run disarmed: after disarm() the watchdog must stay quiet
    indefinitely, then resume normal stall detection at the next
    heartbeat (advisor finding r3: a 5-15 min remote compile must not be
    killed as a stall)."""
    fired = threading.Event()
    wd = StallWatchdog(timeout_s=0.1, poll_s=0.02,
                       on_stall=lambda s: fired.set())
    wd.start()
    try:
        wd.heartbeat()  # armed
        wd.disarm()     # compile about to start
        time.sleep(0.5)  # 5x the timeout: would have fired if armed
        assert not fired.is_set()
        wd.heartbeat()  # compile finished -> re-armed
        time.sleep(0.05)
        assert not fired.is_set()
        assert fired.wait(2.0)  # progress stops -> fires again
    finally:
        wd.stop()


def test_device_reachability_gate_on_stall():
    """The shared gate (used by bench.py and the CLIs) must invoke
    on_stall when the probe transfer cannot complete in time. We can't
    wedge a real tunnel in tests, so inject a slow probe — the gate's
    clock runs over the probe itself."""
    from lighthand_tpu.train.watchdog import device_reachability_gate

    calls = []
    device_reachability_gate(timeout_s=0.05, who="test", poll_s=0.01,
                             on_stall=lambda s: calls.append(s),
                             probe=lambda: time.sleep(0.5))
    # on_stall replaces os._exit, so execution continues past the "wedge"
    assert calls

    # a fast probe must pass the gate silently
    ok_calls = []
    device_reachability_gate(timeout_s=30.0, who="test", poll_s=0.01,
                             on_stall=lambda s: ok_calls.append(s),
                             probe=lambda: None)
    assert not ok_calls


def test_stop_prevents_firing_and_disabled_is_noop():
    fired = threading.Event()
    wd = StallWatchdog(timeout_s=0.2, poll_s=0.05,
                       on_stall=lambda s: fired.set())
    wd.start()
    wd.heartbeat()
    wd.stop()
    time.sleep(0.5)
    assert not fired.is_set()

    off = StallWatchdog(timeout_s=0.0, on_stall=lambda s: fired.set())
    off.start()  # disabled: no thread, heartbeats are no-ops
    off.heartbeat()
    assert off._thread is None
    off.stop()
    assert not fired.is_set()


def test_rss_limit_resolution_and_exceed_paths():
    from lighthand_tpu.train.watchdog import (
        check_rss_limit,
        host_rss_gb,
        resolve_rss_limit_gb,
    )

    rss = host_rss_gb()
    assert rss > 0.01  # this process certainly holds >10 MB

    # explicit limit passes through; auto resolves to 80% of MemTotal
    assert resolve_rss_limit_gb(42.0) == 42.0
    auto = resolve_rss_limit_gb(-1.0)
    assert auto > rss  # sanity: the test runner is nowhere near 80% RAM

    # disabled: no read, no fire
    assert check_rss_limit(0.0) == 0.0

    # over the limit: on_exceed replaces os._exit
    fired = []
    check_rss_limit(rss / 2.0,
                    on_exceed=lambda r, lim: fired.append((r, lim)))
    assert fired and fired[0][0] >= fired[0][1]

    # under the limit: no fire
    fired.clear()
    check_rss_limit(rss + 100.0,
                    on_exceed=lambda r, lim: fired.append((r, lim)))
    assert not fired
