#!/bin/bash
# Serial TPU job queue: the v5e behind the axon relay is SINGLE-TENANT
# (a second process blocks behind the first indefinitely), so every
# hardware job — training runs, probes, benches — goes through this one
# runner.  Jobs are $QDIR/NNN-name.sh files executed in lexical order;
# finished jobs move to $QDIR/done with their log in $QDIR/logs.
# Append jobs at any time (write to a tmp name, then mv — the runner must
# never pick up a half-written file).  Touch $QDIR/STOP to exit once the
# queue drains; rm a queued file to cancel it.
set -u
QDIR=${QDIR:-/tmp/q}
mkdir -p "$QDIR/done" "$QDIR/logs"
cd /root/repo
export MMLF_JAX_CACHE=${MMLF_JAX_CACHE:-/tmp/mmlf_jax_cache}

while true; do
    job=$(ls "$QDIR"/*.sh 2>/dev/null | sort | head -1)
    if [ -z "$job" ]; then
        [ -f "$QDIR/STOP" ] && { echo "== queue drained, stopping" \
            >> "$QDIR/queue.log"; exit 0; }
        sleep 20
        continue
    fi
    name=$(basename "$job" .sh)
    echo "== start $name $(date -u +%F\ %H:%M:%S)" >> "$QDIR/queue.log"
    bash "$job" > "$QDIR/logs/$name.log" 2>&1
    rc=$?
    echo "== done  $name rc=$rc $(date -u +%F\ %H:%M:%S)" >> "$QDIR/queue.log"
    mv "$job" "$QDIR/done/$name.sh"
done
