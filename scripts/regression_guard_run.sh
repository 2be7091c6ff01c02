#!/bin/bash
# Re-prove the ESE calibration guard END TO END on a real broken checkpoint
# (VERDICT r4 next #3).  The r3 failure arms are gone; this retrains the
# exact regression recipe that produced the 80.8-MSE ESE collapse
# (chs=70, seed 0, --train_logvar_warmup=200, NO anchor) and then runs the
# whole guard story:
#   1. validate --val_ensamble          -> guard prints the LOUD warning
#   2. validate (bare UPR)              -> the repair bar (ESE must beat it)
#   3. --val_recalibrate + report JSON  -> post-hoc repair measured
#   4. serve /healthz without and with the calibration -> warning stanza /
#      carried scores
# All outputs land in $ROOT/guard_demo.log via the queue job log.
set -u
ROOT=${PARITY_ROOT:-/tmp/parity}
STEPS=${PARITY_STEPS:-2000}
DATA=$ROOT/data
out=$ROOT/upr70_s0w

RECIPE="--train_trainset=$DATA/train --train_valset=$DATA/val
        --train_shift=2.5 --train_lr=1e-3 --train_bs=512 --train_accum=8
        --train_ps=96 --train_warm_start --bf16 --cache_bf16
        --train_steps=$STEPS --val_interval=250 --train_seed=0"

if [ ! -f "$out/DONE" ]; then
    mkdir -p "$out"
    RESUME=""
    [ -f "$out/checkpoint.msgpack" ] && RESUME="--train_resume"
    echo "== training upr70_s0w (regression recipe) resume=${RESUME:-no} ($(date -u +%H:%M:%S))"
    echo "=== attempt $(date -u +%FT%TZ) resume=${RESUME:-no} ===" \
        >> "$out/train.log"
    # shellcheck disable=SC2086
    python -m mmlf_tpu.train.cli "$out" $RECIPE --model_uncert \
        --model_chs=70 --train_logvar_warmup=200 $RESUME \
        >> "$out/train.log" 2>&1 || echo "== train exited $? (wall bound?)"
    if python scripts/ckpt_step.py "$out" --steps "$STEPS"; then
        touch "$out/DONE"
    else
        echo "== upr70_s0w wall-bounded — left resumable (no DONE)"
        exit 0
    fi
fi

echo "== [guard 1/4] validate --val_ensamble (guard must warn) ($(date -u +%H:%M:%S))"
python -m mmlf_tpu.validate.cli "$out" "$DATA/val" --train_shift=2.5 \
    --val_ensamble > "$ROOT/val_upr70_s0w_ese.log" 2>&1 || true
grep -E 'ESE calibration|WARNING|calibrat' "$ROOT/val_upr70_s0w_ese.log" \
    | tail -8
tail -3 "$ROOT/val_upr70_s0w_ese.log"

echo "== [guard 2/4] bare UPR validate (repair bar) ($(date -u +%H:%M:%S))"
python -m mmlf_tpu.validate.cli "$out" "$DATA/val" --train_shift=2.5 \
    > "$ROOT/val_upr70_s0w_upr.log" 2>&1 || true
tail -3 "$ROOT/val_upr70_s0w_upr.log"

echo "== [guard 3/4] --val_recalibrate repair ($(date -u +%H:%M:%S))"
python -m mmlf_tpu.validate.cli "$out" "$DATA/val" --train_shift=2.5 \
    --val_ensamble --val_recalibrate "$DATA/train" \
    --val_save_calibration "$ROOT/upr70_s0w_cal.json" \
    > "$ROOT/val_upr70_s0w_ese_recal.log" 2>&1 || true
grep -E 'ESE calibration|Fitted|WARNING' \
    "$ROOT/val_upr70_s0w_ese_recal.log" | tail -6
tail -3 "$ROOT/val_upr70_s0w_ese_recal.log"

healthz() {
    python - "$1" <<'PY'
import json, sys, time, urllib.request
port = sys.argv[1]
for _ in range(60):
    try:
        raw = urllib.request.urlopen(
            f'http://127.0.0.1:{port}/healthz', timeout=5).read()
        payload = json.loads(raw)
        print(json.dumps({'ready': payload.get('ready'),
                          'calibration': payload.get('calibration')},
                         indent=1))
        sys.exit(0)
    except Exception:
        time.sleep(2)
print('healthz never came up', file=sys.stderr)
sys.exit(1)
PY
}

echo "== [guard 4/4] /healthz without calibration ($(date -u +%H:%M:%S))"
python -m mmlf_tpu.serve "$out" --val_ensamble --no_warmup --port 8431 \
    --train_shift=2.5 > "$ROOT/serve_nocal.log" 2>&1 &
SPID=$!
healthz 8431 || tail -5 "$ROOT/serve_nocal.log"
kill "$SPID" 2>/dev/null || true
wait "$SPID" 2>/dev/null || true

echo "== [guard 4/4] /healthz WITH calibration ($(date -u +%H:%M:%S))"
python -m mmlf_tpu.serve "$out" --val_ensamble --no_warmup --port 8432 \
    --train_shift=2.5 --calibration "$ROOT/upr70_s0w_cal.json" \
    > "$ROOT/serve_cal.log" 2>&1 &
SPID=$!
healthz 8432 || tail -5 "$ROOT/serve_cal.log"
kill "$SPID" 2>/dev/null || true
wait "$SPID" 2>/dev/null || true
echo "== guard demo complete ($(date -u +%H:%M:%S))"
