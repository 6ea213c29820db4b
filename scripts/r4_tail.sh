#!/usr/bin/env bash
# Tail of the round-4 chip schedule (after scripts/r4_pipeline.sh):
#   1. unicycle fine-tune at the DEPLOYMENT speed cap (v_pref 0.5 — the
#      TurtleBot wheel clip maxes at 0.6125 m/s; see
#      trained_models/GST_predictor_unicycle_ft_r4/NOTES.md), 10M steps
#   2. BENCH_r04 preview run (uncontended)
#   3. cold-compile breakdown (throwaway cache)
# Launch: nohup bash scripts/r4_tail.sh > r4_tail.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

if [ -f r4_pipeline.pid ]; then
  PID=$(cat r4_pipeline.pid)
  echo "[tail] waiting for r4_pipeline (pid $PID)..."
  tail --pid="$PID" -f /dev/null 2>/dev/null || true
fi
echo "[tail] pipeline done at $(date)"

OUT=trained_models/GST_predictor_unicycle_v05_r4
timeout 7000 python -u -m crowdnav_prediction_attngraph_tpu.train \
  --output-dir "$OUT" \
  --num-processes 64 --num-steps 30 --num-env-steps 10000000 \
  --lr 4e-5 --use-linear-lr-decay --seed 425 \
  --kinematics unicycle --robot-v-pref 0.5 --eval-interval 250 \
  --init-params-from trained_models/GST_predictor_rand_tpu_r3/checkpoints \
  --init-params-step 10000 > train_unicycle_v05_r4.log 2>&1
echo "[tail] unicycle v05 done at $(date); best:"
cat "$OUT/best.json" 2>/dev/null || true

echo "[tail] bench preview"
timeout 3000 python bench.py > bench_r4_preview.log 2>&1
tail -1 bench_r4_preview.log

echo "[tail] cold-compile breakdown"
timeout 3000 python scripts/compile_report.py > compile_report_r4.log 2>&1
grep -v "WARNING\|E08" compile_report_r4.log | tail -10
echo "[tail] all done at $(date)"
