#!/bin/bash
# TPU-recipe accuracy check: train all heads with model_chs=64 on the SAME
# data and README recipe as the round-2/3 parity table
# (scripts/parity_runs.sh, chs=70) and validate UPR + ESE + BASE + DPP.
# Purpose: show the >2x-throughput TPU recipe (64 channels tile the MXU
# exactly; bench.py) matches the reference-exact 70-channel configuration
# on accuracy, not just speed.
set -euo pipefail

ROOT=${PARITY_ROOT:-/tmp/parity}
STEPS=${PARITY_STEPS:-2000}
DATA=$ROOT/data

if [ ! -f "$DATA/train/scene_15/gt_disp_lowres.pfm" ]; then
    python -m mmlf_tpu.data.synth "$DATA/train" --scenes 16 --size 512 \
        --seed 0 --disp_center 2.5 --layers 4
    python -m mmlf_tpu.data.synth "$DATA/val" --scenes 4 --size 512 \
        --seed 100 --disp_center 2.5 --layers 4
fi

RECIPE="--train_trainset=$DATA/train --train_valset=$DATA/val
        --train_shift=2.5 --train_lr=1e-3 --train_bs=512 --train_accum=8
        --train_ps=96 --train_warm_start --bf16 --cache_bf16
        --train_steps=$STEPS --val_interval=250"

out=$ROOT/upr64
if [ ! -f "$out/DONE" ]; then
    mkdir -p "$out"
    echo "== training upr64 ($(date -u +%H:%M:%S))"
    # shellcheck disable=SC2086
    python -m mmlf_tpu.train.cli "$out" $RECIPE --model_uncert \
        --model_chs=64 > "$out/train.log" 2>&1
    touch "$out/DONE"
fi

echo "== validating upr64 ($(date -u +%H:%M:%S))"
python -m mmlf_tpu.validate.cli "$ROOT/upr64" "$DATA/val" \
    --train_shift=2.5 > "$ROOT/val_upr64.log" 2>&1
tail -5 "$ROOT/val_upr64.log"

echo "== validating ese64 ($(date -u +%H:%M:%S))"
python -m mmlf_tpu.validate.cli "$ROOT/upr64" "$DATA/val" \
    --train_shift=2.5 --val_ensamble > "$ROOT/val_ese64.log" 2>&1
tail -5 "$ROOT/val_ese64.log"

out=$ROOT/base64
if [ ! -f "$out/DONE" ]; then
    mkdir -p "$out"
    echo "== training base64 ($(date -u +%H:%M:%S))"
    # shellcheck disable=SC2086
    python -m mmlf_tpu.train.cli "$out" $RECIPE \
        --model_chs=64 > "$out/train.log" 2>&1
    touch "$out/DONE"
fi

echo "== validating base64 ($(date -u +%H:%M:%S))"
python -m mmlf_tpu.validate.cli "$ROOT/base64" "$DATA/val" \
    --train_shift=2.5 > "$ROOT/val_base64.log" 2>&1
tail -5 "$ROOT/val_base64.log"

out=$ROOT/dpp64
if [ ! -f "$out/DONE" ]; then
    mkdir -p "$out"
    echo "== training dpp64 ($(date -u +%H:%M:%S))"
    # shellcheck disable=SC2086
    python -m mmlf_tpu.train.cli "$out" $RECIPE --model_discrete \
        --train_loss_multimodal --train_nan_guard \
        --model_chs=64 > "$out/train.log" 2>&1
    touch "$out/DONE"
fi

echo "== validating dpp64 ($(date -u +%H:%M:%S))"
python -m mmlf_tpu.validate.cli "$ROOT/dpp64" "$DATA/val" \
    --train_shift=2.5 --model_discrete > "$ROOT/val_dpp64.log" 2>&1
tail -5 "$ROOT/val_dpp64.log"

echo "== chs64 parity run complete ($(date -u +%H:%M:%S))"
