#!/usr/bin/env bash
# Hyperparameter-sweep fan-out — counterpart of the reference's Slurm array
# job (slurm_jobs/array_job.slurm: --array=0-5, one GPU per trial stream).
# Launch one instance per TPU slice; SHARD/N_SHARDS split the trial list.
set -euo pipefail
CFG=${1:-configs/cluster.ini}
SHARD=${SHARD:-0}
N_SHARDS=${N_SHARDS:-1}
exec python run.py --param_search --cfg "$CFG" --slurm_array_id "$SHARD"
