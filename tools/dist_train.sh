#!/usr/bin/env bash
# Multi-host TPU training launcher (the reference's dist_train.sh wrapped
# torch.distributed.launch; on TPU pods every host runs the same command and
# jax.distributed.initialize() forms the mesh from the TPU runtime's own
# discovery — no process spawner needed on a single host).
#
# Single host (all local chips):
#   bash tools/dist_train.sh CONFIG [args...]
# Multi-host (run on EVERY host of the slice, e.g. via gcloud compute tpus
# tpu-vm ssh --worker=all):
#   COORDINATOR_ADDRESS=<host0-ip:port> NUM_PROCESSES=<n> PROCESS_ID=<i> \
#     bash tools/dist_train.sh CONFIG [args...]
CONFIG=$1
shift
python "$(dirname "$0")/train.py" "$CONFIG" "$@"
