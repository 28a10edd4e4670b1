# Shared helpers for TPU queue scripts — source this, don't copy-paste.
#
#   source "$(dirname "$0")/tpu_stage_lib.sh"
#   stage <name> <workdir> <cmd...>
#
# Encodes the axon single-client protocol (CLAUDE.md): preflight-gate
# every stage, run it under tpu_run_stage.sh's wedge watchdog, then sleep
# out the ~60-120s lazy chip release before the next claimant.
#
# The tpu_queue_r4_*.sh scripts predate this lib and carry their own
# copies (kept verbatim — they are the record of what actually ran);
# new queue scripts should source this instead.

_TPU_LIB_DIR=$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)

preflight() {
  local tag=${1:-stage}
  for i in $(seq 1 30); do
    if timeout 60 python -c "import jax,jax.numpy as jnp; (jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" >/dev/null 2>&1; then
      echo "preflight ok ($tag)"; return 0
    fi
    echo "preflight retry $i ($tag)"; sleep 30
  done
  echo "preflight FAILED ($tag)"; return 1
}

# stage <name> <workdir> <cmd...> — preflight, supervised run, release sleep.
stage() {
  local name=$1 wd=$2; shift 2
  preflight "$name" || exit 1
  bash "$_TPU_LIB_DIR/tpu_run_stage.sh" "$name" "$wd" "$@" \
    || { echo "stage $name FAILED"; exit 1; }
  sleep 150
}

# wait_queue <pidfile...> — block until prior queue processes exit, then
# sleep out the ~60-120s lazy chip release (CLAUDE.md) before claiming.
wait_queue() {
  local pf prev
  for pf in "$@"; do
    if [ -f "$pf" ]; then
      prev=$(cat "$pf")
      while kill -0 "$prev" 2>/dev/null; do
        echo "waiting on $pf (pid $prev)"; sleep 60
      done
    fi
  done
  sleep 150
}

# track_results <msg> <paths...> — git add + commit study artifacts at the
# end of a queue script so no study lands untracked (round-4 verdict
# hygiene item: results must land WITH the session that produced them).
track_results() {
  local msg=$1; shift
  local repo
  repo=$(cd "$_TPU_LIB_DIR/.." && pwd)
  git -C "$repo" add -f "$@" || true
  if git -C "$repo" commit -m "$msg" >/dev/null 2>&1; then
    echo "committed: $msg"
  else
    echo "nothing new to commit for: $msg"
  fi
}
