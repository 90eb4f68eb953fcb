#!/bin/bash
# Round-5 TPU evidence queue (VERDICT r4 item 1): finish the two deferred
# runs to their NATURAL early stop, each followed by the offline eval
# harness. Single-tenant device: one job at a time, ~90 s between jobs
# for the claim to release; every job carries the stall watchdog.
#
# Prerequisites handled before launch (round-5 session):
#   - decoded-crop caches prewarmed CPU-side (tools/prewarm_cache.py):
#     synth20k train/val and frei train/val memmaps are 100% filled, so
#     every epoch is device-bound from step 1 (no cv2 in the loop).
#   - probe confirmed healthy.
#
# Wedge policy: same as round 4 (tools/tpu_queue.sh) — exit 86 triggers a
# probe loop + retry; training resumes from checkpoint-good, losing at
# most the epochs since the last best checkpoint.
set -u
cd /root/repo
LOCK=/tmp/tpu_queue_r5.running
[ -e "$LOCK" ] && { echo "queue already ran/running ($LOCK)"; exit 0; }
touch "$LOCK"
LOG=/tmp/tpu_queue_r5.log
exec >>"$LOG" 2>&1
echo "=== tpu_queue_r5 start $(date) ==="

wait_for_tunnel() { # poll the probe until the tunnel answers (<= ~40 min)
    for i in $(seq 1 20); do
        sleep 120
        timeout 300 python tools/probe_tunnel.py 120 && return 0
        echo "... tunnel still wedged (probe $i/20, $(date))"
    done
    return 1
}

# exit 86 is no longer only a wedge: the RSS-limit guard converts the
# tunnel-client buffer leak (~4.3 GB/epoch on this run, limit ~100 GB)
# into a routine resumable exit every ~20 epochs, so a 34-epoch resume
# legitimately consumes 2+ attempts before any real wedge happens.
ATTEMPTS=6
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

run probe 300 python tools/probe_tunnel.py 120 || { rm -f "$LOCK"; exit 1; }

# 1. synth20k: resume from checkpoint-good (epoch 1 best), natural early
#    stop at --count 12 or epoch 40 (VERDICT item 1a; NO --reset)
run synth20k 28800 python -m lighthand_tpu.cli.train \
    --root simplebaseline/ours --name synth20k \
    --epoch 40 --count 12 --batch_size 64 --num_our 20000 \
    --dataset-root _data --yes --stall-timeout 300

# 2. synth20k through the full 3-regime offline harness
run synth20k_eval 7200 python -m lighthand_tpu.cli.eval \
    --root simplebaseline/ours --name synth20k --eval \
    --dataset-root _data --stall-timeout 300

# 3. frei_e2e: 60-epoch natural-stop story (VERDICT item 1b, r3 item 6)
run frei_e2e 28800 python -m lighthand_tpu.cli.train \
    --root simplebaseline/frei --name frei_e2e \
    --train_yaml _data/freihand_synth/train.yaml \
    --epoch 60 --count 10 --batch_size 64 --yes --stall-timeout 300

# 4. frei_e2e eval harness
run frei_eval 7200 python -m lighthand_tpu.cli.eval \
    --root simplebaseline/frei --name frei_e2e --eval \
    --dataset-root _data --stall-timeout 300

echo "=== tpu_queue_r5 done $(date) ==="
