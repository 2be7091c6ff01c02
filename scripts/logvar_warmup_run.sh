#!/bin/bash
# A/B demonstration for --train_logvar_warmup: retrain the COLLAPSED
# seed-variance runs (scripts/seed_variance_run.sh: UPR seed=1 falls into
# the high-uncertainty optimum, val badpix ~0.9) with the IDENTICAL
# recipe/data/seed plus a 200-step logvar-coupling ramp, then validate
# UPR and ESE per checkpoint.  Numbers land in docs/STATUS.md
# ("seed variance and the logvar-warmup stabilizer").
set -euo pipefail

ROOT=${PARITY_ROOT:-/tmp/parity}
# persistent XLA compilation cache: the 2-6 min relay compiles of the
# train step + per-shape validate programs are paid once across runs
export MMLF_JAX_CACHE=${MMLF_JAX_CACHE:-/tmp/mmlf_jax_cache}
STEPS=${PARITY_STEPS:-2000}
SEED=${PARITY_SEED:-1}
WARMUP=${PARITY_WARMUP:-200}
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
        --train_steps=$STEPS --val_interval=250 --train_seed=$SEED
        --train_logvar_warmup=$WARMUP"

for chs in ${PARITY_CHS:-64 70}; do
    out=$ROOT/upr${chs}_s${SEED}w
    if [ ! -f "$out/DONE" ]; then
        mkdir -p "$out"
        echo "== training upr${chs} seed=$SEED warmup=$WARMUP ($(date -u +%H:%M:%S))"
        # shellcheck disable=SC2086
        python -m mmlf_tpu.train.cli "$out" $RECIPE --model_uncert \
            --model_chs=$chs > "$out/train.log" 2>&1
        touch "$out/DONE"
    fi
    echo "== validating upr${chs}_s${SEED}w ($(date -u +%H:%M:%S))"
    python -m mmlf_tpu.validate.cli "$out" "$DATA/val" \
        --train_shift=2.5 > "$ROOT/val_upr${chs}_s${SEED}w.log" 2>&1
    tail -3 "$ROOT/val_upr${chs}_s${SEED}w.log"
    echo "== validating ese${chs}_s${SEED}w ($(date -u +%H:%M:%S))"
    python -m mmlf_tpu.validate.cli "$out" "$DATA/val" \
        --train_shift=2.5 --val_ensamble > "$ROOT/val_ese${chs}_s${SEED}w.log" 2>&1
    tail -3 "$ROOT/val_ese${chs}_s${SEED}w.log"
done

echo "== warmup A/B run complete ($(date -u +%H:%M:%S))"
