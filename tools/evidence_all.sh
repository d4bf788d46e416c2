#!/usr/bin/env bash
# Round-3 evidence runs, end to end: wait for the TPU tunnel to come back
# (the remote axon backend drops for hours at a time), then run every
# measurement sequentially on the one real chip:
#
#   1. bench.py             — the three BASELINE metrics (driver-parity run)
#   2. tools/psnr_room_run  — long recon schedule + held-out PSNR + trace
#   3. tools/style_full_run — FULL (non-extrapolated) 200-iter style timing
#   4. tools/sweep_render   — render-FPS lever table at 756x1008
#
# Each step is independently timed out and failure-tolerant, so a short TPU
# window still yields partial evidence.  Outputs land in $OUT
# (default /tmp/evidence_r03): one .json + .log per step.
#
# Usage:  OUT=/tmp/evidence_r03 PSNR_ITERS=5000 bash tools/evidence_all.sh
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/evidence_r03}
PSNR_ITERS=${PSNR_ITERS:-5000}
PSNR_DIR=${PSNR_DIR:-/tmp/nerfstyle_room_psnr}
mkdir -p "$OUT"

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/orchestrator.log"; }

wait_tpu() {
  local tries=0
  while true; do
    if timeout 600 python -c '
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
import jax.numpy as jnp
float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum())
print("TPU OK:", d)
' >>"$OUT/orchestrator.log" 2>&1; then
      return 0
    fi
    tries=$((tries + 1))
    log "TPU unavailable (attempt $tries); retrying in 300s"
    sleep 300
  done
}

log "waiting for TPU backend"
wait_tpu
log "TPU is up"

log "step 1/4: bench.py"
timeout 10800 python bench.py >"$OUT/bench.json" 2>"$OUT/bench.log" \
  && log "bench done: $(tail -1 "$OUT/bench.json")" \
  || log "bench FAILED rc=$? (see bench.log)"

log "step 2/4: psnr_room_run (${PSNR_ITERS} iters)"
PSNR_ITERS="$PSNR_ITERS" \
EXTRA="--profile_dir $OUT/trace --profile_start 600 --profile_steps 8" \
timeout 21600 python tools/psnr_room_run.py "$PSNR_DIR" \
  >"$OUT/psnr.json" 2>"$OUT/psnr.log" \
  && log "psnr done: $(tail -1 "$OUT/psnr.json")" \
  || log "psnr FAILED rc=$? (see psnr.log)"

log "step 3/4: style_full_run (200 iters, measured)"
timeout 14400 python tools/style_full_run.py "$PSNR_DIR" \
  >"$OUT/style_full.json" 2>"$OUT/style_full.log" \
  && log "style_full done: $(tail -1 "$OUT/style_full.json")" \
  || log "style_full FAILED rc=$? (see style_full.log)"

log "step 4/4: sweep_render"
ckpt=$(ls -1 "$PSNR_DIR"/logs/*.ckpt 2>/dev/null | tail -1)
if [ -n "${ckpt:-}" ]; then
  timeout 10800 python tools/sweep_render.py \
    --ckpt "$ckpt" --data-cfg "$PSNR_DIR/data.yaml" --frames 2 \
    >"$OUT/sweep.txt" 2>"$OUT/sweep.log" \
    && log "sweep done" || log "sweep FAILED rc=$? (see sweep.log)"
else
  log "sweep SKIPPED: no checkpoint under $PSNR_DIR/logs"
fi

log "all evidence steps attempted; results in $OUT"
