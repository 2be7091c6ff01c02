#!/bin/bash
# One (head, width, seed) cell for the accuracy-parity error-bar table
# (VERDICT r3 item 2): train BASE or DPP with the identical README recipe
# as scripts/parity_runs.sh / chs64_parity_run.sh and validate.  Usage:
#   CELL_HEAD=base|dpp CELL_CHS=64|70 CELL_SEED=N bash scripts/cell_seed_run.sh
set -euo pipefail

ROOT=${PARITY_ROOT:-/tmp/parity}
STEPS=${PARITY_STEPS:-2000}
HEAD=${CELL_HEAD:?}
CHS=${CELL_CHS:?}
SEED=${CELL_SEED:?}
DATA=$ROOT/data

name=${HEAD}${CHS}_s${SEED}
out=$ROOT/$name

RECIPE="--train_trainset=$DATA/train --train_valset=$DATA/val
        --train_shift=2.5 --train_lr=1e-3 --train_bs=512 --train_accum=8
        --train_ps=96 --train_warm_start --bf16 --cache_bf16
        --train_steps=$STEPS --val_interval=250 --train_seed=$SEED
        --model_chs=$CHS"

EXTRA=""
VEXTRA=""
if [ "$HEAD" = dpp ]; then
    EXTRA="--model_discrete --train_loss_multimodal --train_nan_guard"
    VEXTRA="--model_discrete"
fi

if [ ! -f "$out/DONE" ]; then
    mkdir -p "$out"
    # a SIGTERM-bounded earlier attempt leaves checkpoint.msgpack but no
    # DONE — resume it instead of restarting
    RESUME=""
    [ -f "$out/checkpoint.msgpack" ] && RESUME="--train_resume"
    echo "== training $name resume=${RESUME:-no} ($(date -u +%H:%M:%S))"
    # run-boundary marker IN the appended log so step greps can't silently
    # span attempts (ADVICE r4)
    echo "=== attempt $(date -u +%FT%TZ) resume=${RESUME:-no} ===" \
        >> "$out/train.log"
    # shellcheck disable=SC2086
    python -m mmlf_tpu.train.cli "$out" $RECIPE $EXTRA $RESUME \
        >> "$out/train.log" 2>&1 || echo "== train exited $? (wall bound?)"
    # DONE only on PROVEN completion: the SIGTERM checkpoint path returns
    # rc 0, so "the trainer returned" is not evidence (VERDICT r4 weak #2)
    if python scripts/ckpt_step.py "$out" --steps "$STEPS"; then
        touch "$out/DONE"
    else
        echo "== $name wall-bounded — left resumable (no DONE)"
    fi
fi

echo "== validating $name ($(date -u +%H:%M:%S))"
# shellcheck disable=SC2086
python -m mmlf_tpu.validate.cli "$out" "$DATA/val" --train_shift=2.5 \
    $VEXTRA > "$ROOT/val_$name.log" 2>&1
tail -3 "$ROOT/val_$name.log"
echo "== $name complete ($(date -u +%H:%M:%S))"
