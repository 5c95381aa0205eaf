#!/usr/bin/env bash
# Slurm launcher for multi-host TPU training (reference tools/slurm_train.sh
# wrapped `srun ... --launcher slurm`; here every task runs the same
# tools/train.py and jax.distributed.initialize() forms the global mesh from
# the Slurm environment — jax auto-detects SLURM_* variables via its cluster
# detection, so no --launcher flag is needed).
#
# Usage: bash tools/slurm_train.sh PARTITION JOB_NAME CONFIG WORK_DIR [args...]
# Env:   HOSTS (tasks, default 8), CPUS_PER_TASK (default 5), SRUN_ARGS

set -x

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
WORK_DIR=$4
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
    python -u "$(dirname "$0")/train.py" ${CONFIG} --work-dir=${WORK_DIR} ${PY_ARGS}
