#!/bin/bash
# Round-2 TPU training chain: the models VERDICT.md "Next round #4" names —
# w64 single to >=60k steps, the missing w32 pair, and FC 4/8 single+pair
# (the reference codes 4x4/8x8 with fully-connected PNNs; round 1 shipped no
# FC-trained models at all).  Each stage snapshots every 10k; safe to kill.
set -x
cd /root/repo

MEAN=86.8568
TRAIN="python -m context_adaptive_neural_network_based_prediction_tpu.cli.train_pnn"
BUILD="python scripts/build_training_set.py"

# FC triplet shards (offline (above,left,target), reference sets/writing.py
# w in {4,8} mode): single + pair, 200 crops/source x 10 triplets = 16k each.
for W in 4 8; do
  [ -d artifacts/training_set/fc${W}_single ] || \
    $BUILD --output-dir artifacts/training_set/fc${W}_single --width $W --repeats 200
  [ -d artifacts/training_set/fc${W}_pair ] || \
    $BUILD --output-dir artifacts/training_set/fc${W}_pair --width $W --repeats 200 --pair
done

# Stage 1: w64 single to 60k (VERDICT missing #5 / weak #6).
$TRAIN 64 --arch convolutional \
  --shards artifacts/training_set/luminance \
  --mean $MEAN --iters 60000 --results-root artifacts/pnn_results --chunk 100

# Stage 2: w32 pair (manifest dangles without it - ADVICE #1).
$TRAIN 32 --arch convolutional --pair \
  --shards artifacts/training_set/luminance_pair \
  --mean $MEAN --iters 60000 --results-root artifacts/pnn_results --chunk 200

# Stage 3: FC 4/8, single + pair.
for W in 8 4; do
  $TRAIN $W --arch fully_connected \
    --shards artifacts/training_set/fc${W}_single \
    --mean $MEAN --iters 150000 --results-root artifacts/pnn_results --chunk 400
  $TRAIN $W --arch fully_connected --pair \
    --shards artifacts/training_set/fc${W}_pair \
    --mean $MEAN --iters 150000 --results-root artifacts/pnn_results --chunk 400
done
