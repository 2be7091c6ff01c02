#!/bin/bash
# Run-variance check for the TPU-recipe accuracy claim (docs/STATUS.md
# "the TPU recipe matches chs=70 on accuracy"): the table rows are single
# runs at --train_seed=0, so "equal-or-better" needs a ± estimate.  Train
# UPR at BOTH widths with a second seed on the SAME data and README
# recipe as scripts/chs64_parity_run.sh / parity_runs.sh, validate UPR
# and ESE per checkpoint, and compare against the seed-0 rows.
set -euo pipefail

ROOT=${PARITY_ROOT:-/tmp/parity}
STEPS=${PARITY_STEPS:-2000}
SEED=${PARITY_SEED:-1}
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
        --train_steps=$STEPS --val_interval=250 --train_seed=$SEED"

for chs in 64 70; do
    out=$ROOT/upr${chs}_s$SEED
    if [ ! -f "$out/DONE" ]; then
        mkdir -p "$out"
        echo "== training upr${chs} seed=$SEED ($(date -u +%H:%M:%S))"
        # shellcheck disable=SC2086
        python -m mmlf_tpu.train.cli "$out" $RECIPE --model_uncert \
            --model_chs=$chs > "$out/train.log" 2>&1
        touch "$out/DONE"
    fi
    echo "== validating upr${chs}_s$SEED ($(date -u +%H:%M:%S))"
    python -m mmlf_tpu.validate.cli "$out" "$DATA/val" \
        --train_shift=2.5 > "$ROOT/val_upr${chs}_s$SEED.log" 2>&1
    tail -3 "$ROOT/val_upr${chs}_s$SEED.log"
    echo "== validating ese${chs}_s$SEED ($(date -u +%H:%M:%S))"
    python -m mmlf_tpu.validate.cli "$out" "$DATA/val" \
        --train_shift=2.5 --val_ensamble > "$ROOT/val_ese${chs}_s$SEED.log" 2>&1
    tail -3 "$ROOT/val_ese${chs}_s$SEED.log"
done

echo "== seed-variance run complete ($(date -u +%H:%M:%S))"
