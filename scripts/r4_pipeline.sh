#!/usr/bin/env bash
# Round-4 proof pipeline (chip jobs are strictly sequential — one TPU):
#   1. wait for the unicycle fine-tune (uni_ft.pid) to finish
#   2. retrain the flagship on the round-4 production path (bf16 GST
#      predictor inference, LP3-bounded ORCA, pipelined dispatch)
#   3. run the 500-case suite on its best checkpoint
# Launch: nohup bash scripts/r4_pipeline.sh > r4_pipeline.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

if [ -f uni_ft.pid ]; then
  UNI_PID=$(cat uni_ft.pid)
  echo "[pipeline] waiting for unicycle fine-tune (pid $UNI_PID)..."
  tail --pid="$UNI_PID" -f /dev/null 2>/dev/null || true
  echo "[pipeline] unicycle run done at $(date)"
fi

OUT=trained_models/GST_predictor_rand_tpu_r4
echo "[pipeline] flagship retrain -> $OUT"
timeout 14000 python -u -m crowdnav_prediction_attngraph_tpu.train \
  --output-dir "$OUT" \
  --num-processes 64 --num-steps 30 --num-env-steps 20000000 \
  --lr 4e-5 --use-linear-lr-decay --seed 425 \
  --eval-interval 250 > train_flagship_r4.log 2>&1
echo "[pipeline] flagship retrain done at $(date)"

BEST=$(python -c "import json; print(json.load(open('$OUT/best.json'))['update'])" 2>/dev/null)
echo "[pipeline] suite on best checkpoint ($BEST)"
timeout 2000 python -u -m crowdnav_prediction_attngraph_tpu.test \
  --model-dir "$OUT" ${BEST:+--ckpt-step "$BEST"} > r4_test_best.log 2>&1
tail -5 r4_test_best.log
echo "[pipeline] all done at $(date)"
