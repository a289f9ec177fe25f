#!/usr/bin/env bash
# Default end-to-end run (the reference run.sh shape): train the active
# SemanticKITTI config, then evaluate the best checkpoint.
set -e
CFG=stereoscene_tpu/configs/stereoscene_semantickitti.py
WORK=${WORK:-work_dirs/stereoscene}
python tools/train.py "$CFG" --work-dir "$WORK" --bf16 "$@"
python tools/test.py "$CFG" --checkpoint "$WORK/ckpts" --split val
