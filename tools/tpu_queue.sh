#!/bin/bash
# Round-4 TPU work queue — run ONCE when the tunnel recovers (or by
# hand). Single-tenant device: one job at a time, ~90 s between jobs for
# the claim to release. Every job carries the stall watchdog so a
# re-wedge costs minutes, not hours.
#
# Wedge policy (updated after the 15:53 re-wedge: the hrnet_synth run
# stalled 301 s right after its first cold-compiled dispatch, and the
# probe 3 min after the kill round-tripped in 11 s — the claim released
# with the process): exit 86 no longer aborts the whole queue.
# Observed behavior is that a wedge often CLEARS when the wedged process
# exits, so each run gets up to $ATTEMPTS tries, separated by a probe
# loop that waits for the tunnel to answer again. Training runs resume
# from checkpoint-good (no --reset), so retries lose at most one
# unfinished epoch; compiles are served from the persistent XLA cache.
#
# Queue source: VERDICT.md round-3 item 1 (the runs the outage cut):
#   b. train output/hrnet/ours/hrnet_synth from scratch (the re-image
#      wiped the round-3 epoch-3 checkpoint) -> cli.eval harness
#   c. synth20k (fresh for the same reason)
#   d. frei_e2e 60-epoch natural-stop story (VERDICT item 6) -> eval
set -u
cd /root/repo
LOCK=/tmp/tpu_queue.running
[ -e "$LOCK" ] && { echo "queue already ran/running ($LOCK)"; exit 0; }
touch "$LOCK"
LOG=/tmp/tpu_queue.log
exec >>"$LOG" 2>&1
echo "=== tpu_queue start $(date) ==="

# the box has ONE host core: pause any CPU filler run (frei_e2e resume
# etc.) while TPU jobs need the core for host-side feeding
FILLER=""
if [ -f /tmp/frei_cpu.pid ] && kill -0 "$(cat /tmp/frei_cpu.pid)" 2>/dev/null; then
    FILLER=$(cat /tmp/frei_cpu.pid)
    kill -STOP "$FILLER" && echo "paused CPU filler pid $FILLER"
fi
resume_filler() {
    [ -n "$FILLER" ] && kill -CONT "$FILLER" 2>/dev/null \
        && echo "resumed CPU filler pid $FILLER"
}
trap resume_filler EXIT

wait_for_tunnel() { # poll the probe until the tunnel answers (<= ~40 min)
    for i in $(seq 1 20); do
        sleep 120
        timeout 300 python tools/probe_tunnel.py 120 && return 0
        echo "... tunnel still wedged (probe $i/20, $(date))"
    done
    return 1
}

ATTEMPTS=3
run() { # run <name> <timeout_s> <cmd...>; retries exit-86 wedges
    local name=$1 tmo=$2; shift 2
    local rc attempt
    for attempt in $(seq 1 $ATTEMPTS); do
        echo "--- $name (try $attempt/$ATTEMPTS): $* ($(date))"
        timeout "$tmo" "$@"
        rc=$?
        echo "--- $name rc=$rc ($(date))"
        if [ $rc -ne 86 ]; then
            sleep 90  # let the single-tenant claim release
            return $rc
        fi
        echo "=== tunnel wedged during $name; probing for recovery ==="
        if ! wait_for_tunnel; then
            echo "=== tunnel never recovered; queue stopped ($(date)) ==="
            rm -f "$LOCK"   # allow a later invocation to resume the queue
            exit 86
        fi
        sleep 30
    done
    echo "=== $name wedged $ATTEMPTS times; skipping to next job ==="
    return 86
}

# bench + profile already ran green earlier this round (12:27 / 12:54 on
# 2026-08-18 — /tmp/bench_r4.log, /tmp/profile_r4.log); the queue now
# carries only the training evidence runs, which need the synthetic data
# trees — wait for the datagen to finish before claiming the device.
for i in $(seq 1 240); do
    grep -q '^done$' /tmp/make_data.log 2>/dev/null && break
    sleep 30
done
grep -q '^done$' /tmp/make_data.log || { echo "datagen never finished"; rm -f "$LOCK"; exit 1; }

run probe 300 python tools/probe_tunnel.py 120 || exit 1

# hrnet_synth + hrnet_eval COMPLETED 2026-08-18 (PARITY_RESULTS §1b) —
# round-5 order: resume synth20k (cut at epoch 2 to free the device for
# the round-4 driver bench), then the frei natural-stop story.
run synth20k 28800 python -m lighthand_tpu.cli.train \
    --root simplebaseline/ours --name synth20k \
    --epoch 40 --count 12 --batch_size 64 --num_our 20000 \
    --dataset-root _data --yes --stall-timeout 300

# frei_e2e on TPU supersedes any CPU filler resume of the same run
if [ -n "$FILLER" ]; then
    kill "$FILLER" 2>/dev/null && echo "killed CPU filler pid $FILLER (frei moves to TPU)"
    FILLER=""
    sleep 30
fi
run frei_e2e 28800 python -m lighthand_tpu.cli.train \
    --root simplebaseline/frei --name frei_e2e \
    --train_yaml _data/freihand_synth/train.yaml \
    --epoch 60 --count 10 --batch_size 64 --yes --stall-timeout 300

run frei_eval 7200 python -m lighthand_tpu.cli.eval \
    --root simplebaseline/frei --name frei_e2e --eval \
    --dataset-root _data --stall-timeout 300

echo "=== tpu_queue done $(date) ==="
