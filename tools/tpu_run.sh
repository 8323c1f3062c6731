#!/bin/bash
# Run a TPU job with stall detection: consecutive axon-tunnel clients
# sometimes wedge at ~0 CPU before producing any output (observed round
# 4: the first queue job runs, the next hangs indefinitely).  Watch the
# log file; if it doesn't GROW for $STALL_SECS, kill and retry (up to 3
# attempts).  Usage: tpu_run.sh LOGFILE CMD...
LOG="$1"; shift
STALL_SECS=${STALL_SECS:-900}
DONE_RE=${DONE_RE:-final_return}
# resumable: a log that already holds a result is skipped (lets a
# restarted queue pick up where it left off)
if [ -f "$LOG" ] && grep -q "$DONE_RE" "$LOG"; then
  echo "[tpu_run] $LOG already complete, skipping"
  exit 0
fi
for attempt in 1 2 3; do
  : > "$LOG"
  "$@" > "$LOG" 2>&1 &
  PID=$!
  last_size=0
  last_change=$(date +%s)
  while kill -0 $PID 2>/dev/null; do
    sleep 30
    size=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
    now=$(date +%s)
    if [ "$size" != "$last_size" ]; then
      last_size=$size
      last_change=$now
    elif [ $((now - last_change)) -gt "$STALL_SECS" ]; then
      echo "[tpu_run] stall detected (attempt $attempt), killing $PID" >> "$LOG"
      kill $PID 2>/dev/null
      sleep 20
      kill -9 $PID 2>/dev/null
      sleep 10
      break
    fi
  done
  wait $PID 2>/dev/null
  rc=$?
  if grep -q "$DONE_RE" "$LOG"; then
    exit 0
  fi
  echo "[tpu_run] attempt $attempt ended rc=$rc without a result; retrying" >> "$LOG"
  sleep 75   # tunnel grace to release the dead client
done
exit 1
