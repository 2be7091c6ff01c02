#!/bin/bash
# Logvar-anchor A/B arm (VERDICT r3 item 1b): train one UPR arm with the
# README recipe (identical data/steps/accum to scripts/parity_runs.sh /
# seed_variance_run.sh) plus --train_logvar_anchor, then validate UPR and
# ESE.  Usage:
#   ANCHOR_CHS=70 ANCHOR_SEED=0 ANCHOR_WARMUP=200 ANCHOR_W=1.0 \
#     bash scripts/anchor_run.sh
# Output dir: $PARITY_ROOT/upr${CHS}_s${SEED}[w]a
set -euo pipefail

ROOT=${PARITY_ROOT:-/tmp/parity}
STEPS=${PARITY_STEPS:-2000}
CHS=${ANCHOR_CHS:-70}
SEED=${ANCHOR_SEED:-0}
WARMUP=${ANCHOR_WARMUP:-0}
W=${ANCHOR_W:-1.0}
DATA=$ROOT/data

suffix=""
[ "$WARMUP" != "0" ] && suffix="w"
name=upr${CHS}_s${SEED}${suffix}a
out=$ROOT/$name

RECIPE="--train_trainset=$DATA/train --train_valset=$DATA/val
        --train_shift=2.5 --train_lr=1e-3 --train_bs=512 --train_accum=8
        --train_ps=96 --train_warm_start --bf16 --cache_bf16
        --train_steps=$STEPS --val_interval=250 --train_seed=$SEED"

if [ ! -f "$out/DONE" ]; then
    mkdir -p "$out"
    # a SIGTERM-bounded earlier attempt leaves checkpoint.msgpack but no
    # DONE — resume it instead of restarting
    RESUME=""
    [ -f "$out/checkpoint.msgpack" ] && RESUME="--train_resume"
    echo "== training $name anchor=$W warmup=$WARMUP resume=${RESUME:-no} ($(date -u +%H:%M:%S))"
    # run-boundary marker IN the appended log so step greps can't silently
    # span attempts (ADVICE r4)
    echo "=== attempt $(date -u +%FT%TZ) resume=${RESUME:-no} ===" \
        >> "$out/train.log"
    # shellcheck disable=SC2086
    python -m mmlf_tpu.train.cli "$out" $RECIPE --model_uncert \
        --model_chs="$CHS" --train_logvar_anchor="$W" \
        --train_logvar_warmup="$WARMUP" $RESUME >> "$out/train.log" 2>&1 \
        || echo "== train exited $? (wall bound?)"
    # DONE only on PROVEN completion: the SIGTERM checkpoint path returns
    # rc 0, so "the trainer returned" is not evidence (VERDICT r4 weak #2)
    if python scripts/ckpt_step.py "$out" --steps "$STEPS"; then
        touch "$out/DONE"
    else
        echo "== $name wall-bounded — left resumable (no DONE)"
    fi
fi

echo "== validating upr_$name ($(date -u +%H:%M:%S))"
python -m mmlf_tpu.validate.cli "$out" "$DATA/val" --train_shift=2.5 \
    > "$ROOT/val_${name}_upr.log" 2>&1
tail -3 "$ROOT/val_${name}_upr.log"
echo "== validating ese_$name ($(date -u +%H:%M:%S))"
python -m mmlf_tpu.validate.cli "$out" "$DATA/val" --train_shift=2.5 \
    --val_ensamble > "$ROOT/val_${name}_ese.log" 2>&1
tail -3 "$ROOT/val_${name}_ese.log"
echo "== $name complete ($(date -u +%H:%M:%S))"
