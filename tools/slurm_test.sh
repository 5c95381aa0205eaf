#!/usr/bin/env bash
# Slurm launcher for multi-host evaluation (reference tools/slurm_test.sh).
# Every task runs the same tools/test.py; jax.distributed.initialize()
# forms the mesh from the Slurm environment (auto-detected SLURM_* vars).
#
# Usage: bash tools/slurm_test.sh PARTITION JOB_NAME CONFIG CHECKPOINT [args...]
# Env:   HOSTS (tasks, default 8), CPUS_PER_TASK (default 5), SRUN_ARGS

set -x

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
HOSTS=${HOSTS:-8}
CPUS_PER_TASK=${CPUS_PER_TASK:-5}
SRUN_ARGS=${SRUN_ARGS:-""}
PY_ARGS=${@:5}

PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
srun -p ${PARTITION} \
    --job-name=${JOB_NAME} \
    --ntasks=${HOSTS} \
    --ntasks-per-node=1 \
    --cpus-per-task=${CPUS_PER_TASK} \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u "$(dirname "$0")/test.py" ${CONFIG} ${CHECKPOINT} ${PY_ARGS}
