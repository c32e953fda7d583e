#!/bin/bash
# Sequential TPU training chain to (re)build the large-block model zoo.
# Each stage snapshots every 10k steps; safe to interrupt.
set -x
cd /root/repo

MEAN=86.8568
TRAIN="python -m context_adaptive_neural_network_based_prediction_tpu.cli.train_pnn"

# Stage 0: pair training set (codec-compressed contexts, QP in {32,37,42})
if [ ! -d artifacts/training_set/luminance_pair ]; then
  python scripts/build_training_set.py \
    --output-dir artifacts/training_set/luminance_pair --pair
fi

# Stage 1: 32x32 single
$TRAIN 32 --arch convolutional \
  --shards artifacts/training_set/luminance \
  --mean $MEAN --iters 60000 --results-root artifacts/pnn_results --chunk 200

# Stage 2: 64x64 single
$TRAIN 64 --arch convolutional \
  --shards artifacts/training_set/luminance \
  --mean $MEAN --iters 30000 --results-root artifacts/pnn_results --chunk 200

# Stage 3: 32x32 pair
$TRAIN 32 --arch convolutional --pair \
  --shards artifacts/training_set/luminance_pair \
  --mean $MEAN --iters 60000 --results-root artifacts/pnn_results --chunk 200
