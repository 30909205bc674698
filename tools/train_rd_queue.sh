#!/bin/bash
# Round-5 RD-sweep training queue (VERDICT r4 tasks 2-4): serialize TPU
# training jobs for the multi-lambda calibration checkpoints.
#   lambda grid (reference utils/rd_loss.py:15):
#   q0 0.0018  q1 0.0035  q2 0.0067  q3 0.013  q4 0.025  q5 0.0483
#   q6 0.0932  q7 0.18
# Round-5 queue: converge the flagship q6 (the r4 RD row was non-monotone),
# fill q1/q4 (5 of 8 grid points), and multi-rate STF_united (q0/q6).
# All runs resume from the nearest committed lambda's checkpoint and train
# with the half-clean pool (tools/train_calib.py --clean-frac, default 0.5
# — rd_eval scores the clean fixtures).
# Logs under /tmp/calib_logs/, checkpoints under /tmp/calib_<tag>/.
# Export after:  python tools/export_calib.py --ckpt /tmp/calib_<tag>/checkpoint_latest.msgpack \
#                  --out calib/<name>.f16.msgpack [--fit-quantiles ...]
set -u
cd /root/repo
mkdir -p /tmp/calib_logs

run() {
  tag=$1; shift
  echo "=== $(date -u +%H:%M:%S) start $tag ===" | tee -a /tmp/calib_logs/queue.log
  python tools/train_calib.py "$@" --out /tmp/calib_"$tag" \
    > /tmp/calib_logs/"$tag".log 2>&1
  echo "=== $(date -u +%H:%M:%S) done $tag rc=$? ===" | tee -a /tmp/calib_logs/queue.log
}

STEPS=${STEPS:-"u_q6 stfu_q6 stfu_q0 u_q1 u_q4"}
for s in $STEPS; do
  case $s in
    u_q6)
      run u_q6 --model ELIC_united --steps 16000 --lam 0.0932 \
        --resume calib/elic_united_q6.f16.msgpack --save-every 4000 ;;
    u_q1)
      run u_q1 --model ELIC_united --steps 8000 --lam 0.0035 \
        --resume calib/elic_united_q2.f16.msgpack --save-every 4000 ;;
    u_q4)
      run u_q4 --model ELIC_united --steps 8000 --lam 0.025 \
        --resume calib/elic_united_q2.f16.msgpack --save-every 4000 ;;
    stfu_q0)
      run stfu_q0 --model STF_united --steps 6000 --lam 0.0018 \
        --resume calib/STF_united_q2.f16.msgpack --save-every 3000 ;;
    stfu_q6)
      run stfu_q6 --model STF_united --steps 8000 --lam 0.0932 \
        --resume calib/STF_united_q2.f16.msgpack --save-every 4000 ;;
    *) echo "unknown step $s" ;;
  esac
done
echo "=== $(date -u +%H:%M:%S) QUEUE DRAINED ===" | tee -a /tmp/calib_logs/queue.log
