#!/usr/bin/env bash
# Multi-host eval launcher (the reference tools/dist_test.sh shape).
# Each process evaluates its index shard; the tiny metric-state pytrees are
# summed across processes (process_allgather + host sum) instead of the
# reference's pickle-to-tmpdir gather. Run on every host with its NODE_RANK.
#   CONFIG=... NNODES=2 NODE_RANK=0 COORD=host0:12355 ./tools/dist_test.sh
set -e
CONFIG=${CONFIG:-$1}
NNODES=${NNODES:-1}
NODE_RANK=${NODE_RANK:-0}
COORD=${COORD:-localhost:12355}
shift || true
if [ "$NNODES" -gt 1 ]; then
  python "$(dirname "$0")/test.py" "$CONFIG" \
      --coordinator "$COORD" --num-processes "$NNODES" \
      --process-id "$NODE_RANK" "$@"
else
  python "$(dirname "$0")/test.py" "$CONFIG" "$@"
fi
