#!/usr/bin/env bash
# One-command regeneration of the self-collected "sj" GST dataset
# (VERDICT r3 #6: data/sj is gitignored and wiped by container resets; this
# is the EXACT seeded invocation that produced the round-3 4.25M-record set
# behind the committed GST self-training proof, results/gst_sj_tpu_r3).
#
# Collection is deterministic given (seed, num_envs, tot_steps, human_num):
# the ORCA collect env derives every episode from jax.random.key(seed)
# (collect_data.py:39), matching the reference's seeded collection
# (reference collect_data.py:36-39).
#
#   train: 80000 steps x 5 envs, seed 0  -> ~4.26M records, data/sj/train
#   test:   6400 steps x 5 envs, seed 7  -> ~338k records,  data/sj/test
#
# The GST self-training proof then consumes it with (r3_pipeline2.sh:10-13):
#   python -m crowdnav_prediction_attngraph_tpu.models.gst.trainer \
#     --data-dir data/sj --out results/gst_sj_tpu --epochs 100 \
#     --temp-epochs 100 --max-windows 24000 --max-val-windows 4000 \
#     --rotation-pattern random
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${OUT:-data/sj}

python -u -m crowdnav_prediction_attngraph_tpu.collect_data \
  --tot-steps 80000 --num-envs 5 --human-num 20 --phase train --seed 0 \
  --out "$OUT" 2>&1 | tail -1

python -u -m crowdnav_prediction_attngraph_tpu.collect_data \
  --tot-steps 6400 --num-envs 5 --human-num 20 --phase test --seed 7 \
  --out "$OUT" 2>&1 | tail -1

echo "done: $OUT/{train,test}"
