#!/usr/bin/env bash
# TPU-pod training launcher — counterpart of the reference's Slurm GPU jobs
# (slurm_jobs/job.slurm, array_job.slurm). On a multi-host TPU slice run this
# on every host (e.g. via `gcloud compute tpus tpu-vm ssh --worker=all`);
# jax.distributed initialises from the TPU runtime environment.
set -euo pipefail
CFG=${1:-configs/cluster.ini}
shift || true
exec python run.py --train --cfg "$CFG" "$@"
