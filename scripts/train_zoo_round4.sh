#!/bin/bash
# Round-4 training chain (VERDICT r3 task 7): regenerate the training shards
# from the committed recipe, train w64 single to 60k and the MISSING w64
# pair model on the TPU, then freeze + quantize.  Shards are a derived
# artifact: `build_training_set.py` is the committed, reproducible recipe
# (VERDICT missing #5 - the round-3 shards were working-tree only).
# freeze/quantize run after EVERY stage so a wall-clock cut still ships
# whatever trained.
set -x
cd /root/repo

MEAN=86.8568
TRAIN="python -m context_adaptive_neural_network_based_prediction_tpu.cli.train_pnn"
BUILD="python scripts/build_training_set.py"

[ -d artifacts/training_set/luminance/thread_0 ] || $BUILD
[ -d artifacts/training_set/luminance_pair/thread_0 ] || \
  $BUILD --pair --output-dir artifacts/training_set/luminance_pair

# w64 single to 50k (round-3 stopped at 30k, checkpoints uncommitted; 50k
# is what this round's wall clock accommodates at ~10.5 it/s on the chip -
# the 60k target stays open for a follow-up resume, which this chain
# supports via the snapshot/resume path).
$TRAIN 64 --arch convolutional \
  --shards artifacts/training_set/luminance \
  --mean $MEAN --iters 50000 --results-root artifacts/pnn_results --chunk 200
python scripts/freeze_zoo.py && python scripts/quantize_zoo.py

# w64 pair - the zoo's last absent (width, pair) combination.  10k on the
# 8-photo corpus (the local pair models saturate early - RESULTS.md).
$TRAIN 64 --arch convolutional --pair \
  --shards artifacts/training_set/luminance_pair \
  --mean $MEAN --iters 10000 --results-root artifacts/pnn_results --chunk 200
python scripts/freeze_zoo.py && python scripts/quantize_zoo.py
echo ROUND4_TRAINING_DONE
