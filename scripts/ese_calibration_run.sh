#!/bin/bash
# ESE calibration experiment (VERDICT r1 item 5): the reference's
# ImprovedUncertaintyL1Loss only teaches "high logvar out of range" when
# --train_loss_padding is set (reference mmlf/model/loss.py:271-285), and
# the README recipe does not set it — the min-logvar ensemble selection
# then has to extrapolate logvar into disparity ranges the trunk never saw
# (grid reach ±3.5 vs trained reach ≈ ±1 after recentering).
#
# This trains the UPR recipe WITH the padding term (pad = 1.0 = the
# RandomShift training reach) and compares ESE validation + the
# scripts/ese_diag.py calibration report against the padless UPR from
# scripts/parity_runs.sh.  Run AFTER parity_runs.sh (reuses its dataset).
set -euo pipefail

ROOT=${PARITY_ROOT:-/tmp/parity}
STEPS=${PARITY_STEPS:-2000}
DATA=$ROOT/data

RECIPE="--train_trainset=$DATA/train --train_valset=$DATA/val
        --train_shift=2.5 --train_lr=1e-3 --train_bs=512 --train_accum=8
        --train_ps=96 --train_warm_start --bf16 --cache_bf16
        --train_steps=$STEPS --val_interval=250"

out=$ROOT/uprp
if [ ! -f "$out/DONE" ]; then
    mkdir -p "$out"
    echo "== training uprp (UPR + --train_loss_padding 1.0) ($(date -u +%H:%M:%S))"
    # shellcheck disable=SC2086
    python -m mmlf_tpu.train.cli "$out" $RECIPE --model_uncert \
        --train_loss_padding 1.0 > "$out/train.log" 2>&1
    touch "$out/DONE"
fi

echo "== validating uprp / esep ($(date -u +%H:%M:%S))"
python -m mmlf_tpu.validate.cli "$out" "$DATA/val" --train_shift=2.5 \
    > "$ROOT/val_uprp.log" 2>&1
python -m mmlf_tpu.validate.cli "$out" "$DATA/val" --train_shift=2.5 \
    --val_ensamble > "$ROOT/val_esep.log" 2>&1
tail -3 "$ROOT/val_esep.log"

echo "== ese_diag: padless UPR ($(date -u +%H:%M:%S))"
python scripts/ese_diag.py "$ROOT/upr" "$DATA/val" --scenes 2 \
    | tee "$ROOT/diag_upr.txt"
echo "== ese_diag: padded UPR"
python scripts/ese_diag.py "$out" "$DATA/val" --scenes 2 \
    | tee "$ROOT/diag_uprp.txt"
