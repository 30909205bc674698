#!/bin/bash
# One-shot measurement campaign for when the TPU tunnel returns.
# Runs the staged knob A/Bs + a decode-flow trace via tools/prof.py,
# sequentially (tunnel discipline: interleaved A/B inside each run,
# nothing concurrent), logging to $OUT.  Continues past failures.
#
#   bash tools/campaign_tpu.sh            # full sequence
#   STEPS="trace bench" bash tools/campaign_tpu.sh   # subset
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

STEPS=${STEPS:-"trace phases escfix scanout flat flow16 bench"}

for s in $STEPS; do
  case $s in
    trace)
      run trace 1800 python tools/prof.py trace --phase dec_flow ;;
    phases)
      run phases 2400 python tools/prof.py phases ;;
    escfix)
      run knob_escfix 2400 python tools/prof.py ab --on RGBDC_DEC_ESCFIX=1 ;;
    scanout)
      run knob_scanout 2400 python tools/prof.py ab --on RGBDC_ENC_SCANOUT=1 ;;
    flat)
      run knob_flat 2400 python tools/prof.py ab --on RGBDC_FLAT_UPLOAD=1 ;;
    flow16)
      run knob_flow16 2400 python tools/prof.py ab --on RGBDC_BF16_FLOW=1 \
          --no-byte-check ;;
    bench)
      run bench 2400 python bench.py ;;
    *) echo "unknown step $s" ;;
  esac
done
echo "campaign done ($(date))" | tee -a "$OUT/summary.log"
