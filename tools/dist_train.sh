#!/usr/bin/env bash
# Multi-host training launcher (the reference tools/dist_train.sh shape).
# JAX multi-host: run this same command on every host with its PROC_ID.
#   CONFIG=... NNODES=2 NODE_RANK=0 COORD=host0:12355 ./tools/dist_train.sh
set -e
CONFIG=${CONFIG:-$1}
NNODES=${NNODES:-1}
NODE_RANK=${NODE_RANK:-0}
COORD=${COORD:-localhost:12355}
shift || true
python "$(dirname "$0")/train.py" "$CONFIG" \
    --coordinator "$COORD" --num-processes "$NNODES" --process-id "$NODE_RANK" \
    "$@"
