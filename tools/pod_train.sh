#!/usr/bin/env bash
# Multi-host training launcher (reference: tools/dist_train.sh:1-10 /
# tools/slurm_train.sh:1-24). JAX is single-controller PER HOST: launch ONE
# process per host (not per chip) and every process sees the global device
# set once jax.distributed.initialize() succeeds.
#
#   TPU pod slice (auto-detection; run on every host, e.g. via gcloud ssh --worker=all):
#     bash tools/pod_train.sh CONFIG [train.py args...]
#
#   Generic cluster (explicit coordinator, mirrors MASTER_ADDR/WORLD_SIZE/RANK):
#     JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=4 JAX_PROCESS_ID=$i \
#       bash tools/pod_train.sh CONFIG [args...]
#
#   SLURM (one task per host):
#     srun --ntasks=$NNODES --ntasks-per-node=1 bash tools/pod_train.sh CONFIG [args...]
#
# With any JAX_* coordinator variable set, a failed initialize ABORTS the run
# (no silent single-host degradation — parallel/distributed.py policy).
set -euo pipefail

CONFIG=$1
shift

# SLURM auto-mapping (reference tools/slurm_train.sh srun semantics)
if [ -n "${SLURM_PROCID:-}" ] && [ -z "${JAX_PROCESS_ID:-}" ]; then
    export JAX_PROCESS_ID=$SLURM_PROCID
    export JAX_NUM_PROCESSES=${SLURM_NTASKS}
    if [ -z "${JAX_COORDINATOR_ADDRESS:-}" ]; then
        master=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1)
        export JAX_COORDINATOR_ADDRESS="${master}:${JAX_COORDINATOR_PORT:-12345}"
    fi
fi

exec python "$(dirname "$0")/train.py" "$CONFIG" "$@"
