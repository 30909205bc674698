#!/bin/bash
# Round-4 RD-sweep training queue (VERDICT r3 task 1): serialize TPU
# training jobs for the multi-lambda calibration checkpoints.
#   q0 -> lambda 0.0018, q6 -> lambda 0.0932 (reference utils/rd_loss.py:15)
# Logs under /tmp/calib_logs/, checkpoints under /tmp/calib_<tag>/.
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

run u_q0   --model ELIC_united --steps 4000 --lam 0.0018
run u_q6   --model ELIC_united --steps 4000 --lam 0.0932
run elic_q0 --model ELIC --steps 3000 --lam 0.0018
run elic_q6 --model ELIC --steps 3000 --lam 0.0932
# STF_united re-convergence: resume from the committed q2 artifact and push
# until streams fit WMAX=128 (VERDICT r3 task 1 tail).
run stfu_q2 --model STF_united --steps 3500 --lam 0.0067 \
  --resume calib/STF_united_q2.f16.msgpack
echo "=== $(date -u +%H:%M:%S) QUEUE DRAINED ===" | tee -a /tmp/calib_logs/queue.log
