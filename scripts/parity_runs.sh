#!/bin/bash
# End-to-end metric-parity runs (VERDICT r1 item 2): train BASE / UPR / DPP
# with the reference README recipe (reference README.md:31-44 — bs=512,
# ps=96, lr=1e-3, train_shift=2.5, warm start; bs=512 realized on one chip
# as 8x64 gradient accumulation), then run the full validate CLI per head
# (ESE = UPR checkpoint + --val_ensamble, README.md:49-60) and collect the
# reference-format metric rows.
#
# Dataset: the richest obtainable HCI-format data (the real HCI benchmark
# is not fetchable in this environment — zero egress): synthetic 512^2
# scenes with 4 depth layers and off-center disparities (disp_center=2.5,
# matching the off-center dataset the reference trains on with
# --train_shift=2.5).
set -euo pipefail

ROOT=${PARITY_ROOT:-/tmp/parity}
STEPS=${PARITY_STEPS:-2000}
SCENES=${PARITY_SCENES:-16}
SIZE=${PARITY_SIZE:-512}
DATA=$ROOT/data
mkdir -p "$ROOT"

last=$(printf 'scene_%02d' $((SCENES - 1)))
if [ ! -f "$DATA/train/$last/gt_disp_lowres.pfm" ]; then
    python -m mmlf_tpu.data.synth "$DATA/train" --scenes "$SCENES" \
        --size "$SIZE" --seed 0 --disp_center 2.5 --layers 4
    python -m mmlf_tpu.data.synth "$DATA/val" --scenes 4 --size "$SIZE" \
        --seed 100 --disp_center 2.5 --layers 4
fi

RECIPE="--train_trainset=$DATA/train --train_valset=$DATA/val
        --train_shift=2.5 --train_lr=1e-3 --train_bs=512 --train_accum=8
        --train_ps=96 --train_warm_start --bf16 --cache_bf16
        --train_steps=$STEPS --val_interval=250"

train_one () {  # name, extra flags...
    local name=$1; shift
    local out=$ROOT/$name
    if [ -f "$out/DONE" ]; then echo "== $name already trained"; return; fi
    mkdir -p "$out"
    echo "== training $name ($(date -u +%H:%M:%S))"
    # shellcheck disable=SC2086
    python -m mmlf_tpu.train.cli "$out" $RECIPE "$@" \
        > "$out/train.log" 2>&1
    touch "$out/DONE"
}

val_one () {  # name, ckpt dir, extra flags...
    local name=$1 dir=$2; shift 2
    echo "== validating $name ($(date -u +%H:%M:%S))"
    python -m mmlf_tpu.validate.cli "$ROOT/$dir" "$DATA/val" \
        --train_shift=2.5 "$@" > "$ROOT/val_$name.log" 2>&1
    tail -5 "$ROOT/val_$name.log"
}

train_one base
train_one upr --model_uncert
train_one dpp --model_discrete --train_loss_multimodal --train_nan_guard

val_one base base
val_one upr  upr
val_one ese  upr --val_ensamble
val_one dpp  dpp --model_discrete

echo "== all parity runs complete ($(date -u +%H:%M:%S))"
