#!/bin/bash
# Round-4 TPU work queue — run ONCE when the tunnel recovers (the probe
# loop in /tmp invokes this; or run by hand). Single-tenant device: one
# job at a time, ~90 s between jobs for the claim to release. Every job
# carries the stall watchdog so a re-wedge costs minutes, not hours; on
# exit 86 (wedge) the queue stops — later jobs would only hang too.
#
# Queue source: VERDICT.md round-3 item 1 (the runs the outage cut):
#   a. headline bench (green BENCH artifact material)
#   b. resume output/hrnet/ours/hrnet_synth (epoch 3/16 at cut) -> eval
#   c. resume output/simplebaseline/ours/synth20k (epoch 8, count 0/12)
#   d. re-profile the shipped step (VERDICT item 2, roofline refresh)
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

run() { # run <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    echo "--- $name: $* ($(date))"
    timeout "$tmo" "$@"
    local rc=$?
    echo "--- $name rc=$rc ($(date))"
    if [ $rc -eq 86 ]; then
        echo "=== tunnel re-wedged during $name; queue stopped ==="
        rm -f "$LOCK"   # allow a later retry to resume the queue
        exit 86
    fi
    sleep 90  # let the single-tenant claim release
    return $rc
}

run probe 300 python tools/probe_tunnel.py 120 || exit 1

run bench 5400 python bench.py
cp -f /root/repo/BENCH_TABLE.json /tmp/BENCH_TABLE.pre_r4.json 2>/dev/null

run hrnet_synth 28800 python -m lighthand_tpu.cli.train \
    --root hrnet/ours --name hrnet_synth \
    --epoch 16 --count 8 --num_our 8000 --batch_size 64 \
    --dataset-root _data --yes --stall-timeout 300

run hrnet_eval 7200 python -m lighthand_tpu.cli.eval \
    --root hrnet/ours --name hrnet_synth --eval --dataset-root _data \
    --stall-timeout 300

run profile 3600 python tools/profile_step.py --steps 8 --per-op \
    --out /tmp/lh_trace_r4

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
