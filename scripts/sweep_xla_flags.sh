#!/bin/bash
# Sequential A/B sweep of TPU compiler flags over the axon tunnel
# (one compiling process at a time — the relay 500s on concurrent compiles).
# Each candidate is merged with the production scoped-VMEM optimum so the
# A/B isolates the candidate flag. Results append to $OUT as JSONL.
#
#   bash scripts/sweep_xla_flags.sh [out.jsonl]
#
# Flag candidates come from public TPU tuning lists (MaxText et al.);
# unknown-flag compile failures are recorded and skipped.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/xla_flag_sweep.jsonl}"

VMEM='"xla_tpu_scoped_vmem_limit_kib": "65536"'

run_probe() {
  local label="$1" opts="$2"
  echo "=== $label: $opts" >&2
  local line
  line=$(timeout 1200 python scripts/probe_xla_opts.py "$opts" 2>/tmp/probe_err.txt)
  local rc=$?
  if [ $rc -eq 0 ] && [ -n "$line" ]; then
    echo "{\"label\": \"$label\", \"result\": $line}" >> "$OUT"
  else
    local err
    err=$(tail -c 300 /tmp/probe_err.txt | tr '\n"' ' .')
    echo "{\"label\": \"$label\", \"rc\": $rc, \"err\": \"$err\"}" >> "$OUT"
  fi
}

run_probe control "{$VMEM}"
run_probe mbl_opt "{$VMEM, \"xla_tpu_memory_bound_loop_optimizer_options\": \"enabled:true\"}"
run_probe repeated_prefetch "{$VMEM, \"xla_tpu_use_repeated_instance_for_preferred_prefetch_time\": \"true\"}"
run_probe bcast_priority "{$VMEM, \"xla_tpu_enable_aggressive_broadcast_priority_update\": \"true\"}"
run_probe msa_copy_ratio "{$VMEM, \"xla_tpu_msa_inefficient_use_to_copy_ratio\": \"0.5\"}"
run_probe licm_inflation "{$VMEM, \"xla_tpu_licm_size_inflation_ratio\": \"2\"}"
run_probe async_copy_bw "{$VMEM, \"xla_tpu_async_copy_bandwidth_scaling_factor\": \"0.5\"}"

echo "sweep done -> $OUT" >&2
cat "$OUT"
