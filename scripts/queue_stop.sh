#!/bin/bash
# End-of-session wrap-up for the serial TPU queue (VERDICT r4 item 1c):
# the v5e behind the relay is SINGLE-TENANT, so any queued or running job
# left behind at round end blocks the driver's bench.py indefinitely —
# round 4's official bench record is empty for exactly this reason.
#
#   bash scripts/queue_stop.sh            # defer queued jobs; runner exits
#                                         # after the CURRENT job finishes
#   bash scripts/queue_stop.sh --kill     # additionally TERM the running
#                                         # job tree (trainers checkpoint on
#                                         # SIGTERM and stay resumable),
#                                         # escalating to KILL after GRACE
#
# Job pids are found by walking /proc children of the recorded runner pid —
# never by pattern matching (a pattern can match this session itself).
set -u
QDIR=${QDIR:-/tmp/q}
GRACE=${GRACE:-120}

touch "$QDIR/STOP"
mkdir -p "$QDIR/deferred"
moved=$(ls "$QDIR"/*.sh 2>/dev/null | wc -l)
mv "$QDIR"/*.sh "$QDIR/deferred/" 2>/dev/null || true
echo "deferred $moved queued job(s) to $QDIR/deferred; STOP set"

if [ "${1:-}" != "--kill" ]; then
    echo "runner will exit once the current job (if any) finishes"
    exit 0
fi

RUNNER=$(cat "$QDIR/runner.pid" 2>/dev/null || true)
if [ -z "$RUNNER" ] || [ ! -d "/proc/$RUNNER" ]; then
    echo "no live runner (pid '${RUNNER:-none}')"
    exit 0
fi

descendants() {  # all strict descendants of $1, leaves first
    local p
    for p in $(cat /proc/"$1"/task/*/children 2>/dev/null); do
        descendants "$p"
        echo "$p"
    done
}

pids=$(descendants "$RUNNER")
if [ -z "$pids" ]; then
    echo "runner $RUNNER has no running job"
    exit 0
fi
echo "TERM job tree of runner $RUNNER: $pids"
for p in $pids; do kill -TERM "$p" 2>/dev/null || true; done
for _ in $(seq "$GRACE"); do
    sleep 1
    alive=""
    for p in $pids; do [ -d "/proc/$p" ] && alive="$alive $p"; done
    [ -z "$alive" ] && { echo "job tree exited cleanly"; exit 0; }
done
echo "escalating to KILL:$alive"
for p in $alive; do kill -KILL "$p" 2>/dev/null || true; done
