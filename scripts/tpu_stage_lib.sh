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
