#!/bin/bash
# One-shot measurement campaign for when the TPU tunnel returns.
# Runs every staged A/B + the Pallas probe + the scan trace, sequentially
# (tunnel discipline: interleaved A/B inside each script, nothing
# concurrent), logging to $OUT.  Continues past failures — a lowering
# failure is a RESULT.
#
#   bash tools/campaign_tpu.sh            # full sequence
#   STEPS="probe stack" bash tools/campaign_tpu.sh   # subset
set -u
cd "$(dirname "$0")/.."
# Prepend (never overwrite) PYTHONPATH: the axon PJRT plugin lives on the
# inherited PYTHONPATH (/root/.axon_site); clobbering it kills the backend.
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=${OUT:-/tmp/campaign}
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$OUT/summary.log"
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  tail -12 "$OUT/$name.log" | tee -a "$OUT/summary.log"
  echo "--- $name rc=$rc" | tee -a "$OUT/summary.log"
}

STEPS=${STEPS:-"trace probe escfix scanout flat flow16 dense stack bench"}

for s in $STEPS; do
  case $s in
    trace)
      # attribute the XLA decode scan's ~190 us/row (run FIRST per ROADMAP)
      run trace 1800 python tools/prof_scan_trace.py ;;
    probe)
      # Mosaic lowering + ns/sym for the Pallas kernels vs the XLA scan
      run probe 2400 python tools/probe_pallas.py ;;
    escfix|scanout|flat|flow16|dense|stack)
      run "knob_$s" 2400 env KNOB=$s python tools/prof_knobs_ab.py ;;
    bench)
      run bench 2400 python bench.py ;;
    *) echo "unknown step $s" ;;
  esac
done
echo "campaign done ($(date))" | tee -a "$OUT/summary.log"
