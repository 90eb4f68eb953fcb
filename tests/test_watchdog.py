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
