#!/usr/bin/env bash
# Multi-host eval launcher. Metric states reduce with psum — no pickle
# gathers (SURVEY.md 2.4).
set -e
CONFIG=${CONFIG:-$1}
shift || true
python "$(dirname "$0")/test.py" "$CONFIG" "$@"
