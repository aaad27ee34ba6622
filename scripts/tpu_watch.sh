#!/bin/sh
# Poll for TPU tunnel recovery; on first successful backend init, run the
# staged round-3 measurement session (scripts/tpu_session_r3.sh) once.
# Safe to re-run: exits immediately if the session already completed.
set -u
OUT=/tmp/tpu_r3
mkdir -p "$OUT"
if [ -f "$OUT/99_done" ]; then
  echo "session already done"; exit 0
fi
while :; do
  if timeout 150 python -c "import jax; assert jax.devices()" >"$OUT/probe.log" 2>&1; then
    echo "$(date -u +%FT%TZ) tunnel up — starting session" >> "$OUT/watch.log"
    sh /root/repo/scripts/tpu_session_r3.sh >> "$OUT/watch.log" 2>&1
    exit 0
  fi
  echo "$(date -u +%FT%TZ) tunnel still down" >> "$OUT/watch.log"
  sleep 240
done
