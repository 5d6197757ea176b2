#!/usr/bin/env bash
# Positional-arg wrapper, drop-in compatible with the reference's run.sh
# (reference: run.sh ≈L1-40):
#   bash run.sh {train|valid|test} MODEL DATASET GPU_ID SAVE_ID \
#       BATCH NEG_SIZE DIM GAMMA ALPHA LR MAX_STEPS TEST_BATCH [-de -dr -r ...]
# GPU_ID is accepted for compatibility and ignored (TPU backend).
set -euo pipefail

MODE=$1
MODEL=$2
DATASET=$3
GPU_DEVICE=$4   # ignored on TPU
SAVE_ID=$5

FULL_DATA_PATH=data/$DATASET
SAVE=models/"$MODEL"_"$DATASET"_"$SAVE_ID"

if [ "$MODE" == "train" ]; then
  BATCH_SIZE=$6
  NEGATIVE_SAMPLE_SIZE=$7
  HIDDEN_DIM=$8
  GAMMA=$9
  ALPHA=${10}
  LEARNING_RATE=${11}
  MAX_STEPS=${12}
  TEST_BATCH_SIZE=${13}
  shift 13 || true
  python -u -m knowledgegraphembedding_tpu.cli --do_train \
    --do_valid \
    --do_test \
    --data_path "$FULL_DATA_PATH" \
    --model "$MODEL" \
    -n "$NEGATIVE_SAMPLE_SIZE" -b "$BATCH_SIZE" -d "$HIDDEN_DIM" \
    -g "$GAMMA" -a "$ALPHA" -adv \
    -lr "$LEARNING_RATE" --max_steps "$MAX_STEPS" \
    -save "$SAVE" --test_batch_size "$TEST_BATCH_SIZE" \
    "$@"
elif [ "$MODE" == "valid" ]; then
  python -u -m knowledgegraphembedding_tpu.cli --do_valid -init "$SAVE"
elif [ "$MODE" == "test" ]; then
  python -u -m knowledgegraphembedding_tpu.cli --do_test -init "$SAVE"
else
  echo "Unknown MODE $MODE" >&2
  exit 1
fi
