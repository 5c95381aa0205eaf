#!/usr/bin/env bash
# Evaluation launcher (see dist_train.sh for the multi-host convention).
CONFIG=$1
CHECKPOINT=$2
shift 2
python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" "$@"
