#!/bin/bash
# Supervised TPU stage runner: run one python stage with wedge detection.
#
# The axon tunnel occasionally drops a client into a permanent futex wait
# (all threads in futex_do_wait, zero CPU/IO progress — observed twice on
# 2026-08-17 even with preflight + 150s lazy-release sleeps). A wedged
# client never recovers, but killing it and retrying the stage does.
# Distinguishing a wedge from a slow remote compile: during a compile the
# process exchanges bytes with the compile helper (rchar grows) or burns
# CPU (tracing); a wedge freezes BOTH for the whole window.
#
# Usage: tpu_run_stage.sh <name> <workdir> <cmd...>
#   env: STAGE_FROZEN_MIN (default 15) minutes of zero CPU+IO delta => kill
#        STAGE_ATTEMPTS   (default 3)
#        STAGE_TIMEOUT_S  (default 5400) hard per-attempt wall clock
set -u
NAME=$1; WD=$2; shift 2
FROZEN_MIN=${STAGE_FROZEN_MIN:-15}
ATTEMPTS=${STAGE_ATTEMPTS:-3}
HARD_TIMEOUT=${STAGE_TIMEOUT_S:-5400}

snapshot() {  # "<utime+stime> <rchar>" of pid $1, or "dead"
  local pid=$1
  if [ ! -d "/proc/$pid" ]; then echo dead; return; fi
  local cpu io
  cpu=$(awk '{print $14+$15}' "/proc/$pid/stat" 2>/dev/null) || { echo dead; return; }
  io=$(awk '/^rchar/{print $2}' "/proc/$pid/io" 2>/dev/null) || io=0
  echo "$cpu $io"
}

for attempt in $(seq 1 "$ATTEMPTS"); do
  echo "[stage $NAME] attempt $attempt/$ATTEMPTS"
  ( cd "$WD" && exec stdbuf -oL "$@" ) &
  PID=$!
  start=$(date +%s)
  last_snap=""
  frozen=0
  rc=""
  while true; do
    sleep 60
    if ! kill -0 "$PID" 2>/dev/null; then
      wait "$PID"; rc=$?
      break
    fi
    now=$(date +%s)
    if [ $((now - start)) -gt "$HARD_TIMEOUT" ]; then
      echo "[stage $NAME] hard timeout ${HARD_TIMEOUT}s — killing $PID"
      kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
      rc=124; break
    fi
    snap=$(snapshot "$PID")
    if [ "$snap" = "$last_snap" ] && [ "$snap" != "dead" ]; then
      frozen=$((frozen + 1))
    else
      frozen=0
    fi
    last_snap=$snap
    if [ "$frozen" -ge "$FROZEN_MIN" ]; then
      echo "[stage $NAME] FROZEN ${FROZEN_MIN}min (cpu+io static: $snap) — killing $PID"
      kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
      rc=125; break
    fi
  done
  if [ "$rc" = "0" ]; then
    echo "[stage $NAME] ok"
    exit 0
  fi
  echo "[stage $NAME] attempt $attempt failed rc=$rc; waiting out chip release"
  sleep 180
done
echo "[stage $NAME] FAILED after $ATTEMPTS attempts"
exit 1
