#!/usr/bin/env bash
# Round-5 chip pipeline (serialized — ONE chip):
#   1. GST predictor retrained with the REFERENCE's actual recipe
#      (args.pickle of the shipped sj checkpoint: batch_size=64, lr 1e-3,
#      NO rotation augmentation — r3's self-training had guessed batch 16
#      + random rotation) on the same 24k-window budget, then a 2x-data
#      variant; both evaluated on the identical 4000-window split.
#   2. Unicycle from scratch at deployment limits (VERDICT r4 #5):
#      v_pref 0.6 (TurtleBot wheel clip), 40M steps, spin penalty annealed
#      over the first 8M steps.
#   3. Final bench.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "[r5] GST batch-64 recipe (reference args) $(date)"
timeout 14000 python -u -m crowdnav_prediction_attngraph_tpu.models.gst.trainer \
  --data-dir data/sj --out results/gst_sj_tpu_r5_b64 --epochs 100 \
  --temp-epochs 100 --batch-size 64 --max-windows 24000 \
  --max-val-windows 4000 > results/logs/gst_train_r5_b64.log 2>&1
echo "  exit=$?"; tail -2 results/logs/gst_train_r5_b64.log

timeout 3000 python -u -m crowdnav_prediction_attngraph_tpu.models.gst.eval \
  --ckpt results/gst_sj_tpu_r5_b64/epoch_100 --data-dir data/sj/test \
  --mode val --max-peds 32 --max-windows 4000 \
  > results/logs/gst_eval_r5_b64.log 2>&1
tail -2 results/logs/gst_eval_r5_b64.log

echo "[r5] GST batch-64, 2x data $(date)"
timeout 14000 python -u -m crowdnav_prediction_attngraph_tpu.models.gst.trainer \
  --data-dir data/sj --out results/gst_sj_tpu_r5_b64_48k --epochs 100 \
  --temp-epochs 100 --batch-size 64 --max-windows 48000 \
  --max-val-windows 4000 > results/logs/gst_train_r5_b64_48k.log 2>&1
echo "  exit=$?"; tail -2 results/logs/gst_train_r5_b64_48k.log

timeout 3000 python -u -m crowdnav_prediction_attngraph_tpu.models.gst.eval \
  --ckpt results/gst_sj_tpu_r5_b64_48k/epoch_100 --data-dir data/sj/test \
  --mode val --max-peds 32 --max-windows 4000 \
  > results/logs/gst_eval_r5_b64_48k.log 2>&1
tail -2 results/logs/gst_eval_r5_b64_48k.log

echo "[r5] unicycle from scratch, deployment limits, spin warmup $(date)"
OUT=trained_models/GST_predictor_unicycle_scratch_r5
timeout 14000 python -u -m crowdnav_prediction_attngraph_tpu.train \
  --output-dir "$OUT" \
  --num-processes 64 --num-steps 30 --num-env-steps 40000000 \
  --lr 4e-5 --use-linear-lr-decay --seed 425 \
  --kinematics unicycle --robot-v-pref 0.6 \
  --spin-warmup-steps 8000000 \
  --eval-interval 250 > results/logs/train_unicycle_scratch_r5.log 2>&1
echo "  exit=$?"; tail -3 results/logs/train_unicycle_scratch_r5.log

BEST=$(python -c "import json;print(json.load(open('$OUT/best.json'))['update'])" 2>/dev/null || true)
timeout 3000 python -u -m crowdnav_prediction_attngraph_tpu.test \
  --model-dir "$OUT" ${BEST:+--ckpt-step "$BEST"} \
  > results/logs/r5_test_unicycle_scratch.log 2>&1
tail -2 results/logs/r5_test_unicycle_scratch.log

echo "[r5] final bench $(date)"
python bench.py > results/logs/bench_r5_preview.log 2>&1
tail -1 results/logs/bench_r5_preview.log
echo "[r5] pipeline done $(date)"
