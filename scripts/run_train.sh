#!/usr/bin/env bash
# TPU-pod training driver (reference: scripts/run_train.sh SLURM 4xH100).
# One process per host; JAX discovers local chips, jax.distributed wires hosts.
set -euo pipefail
DATA=${1:?usage: run_train.sh train.parquet [extra overrides...]}
shift || true
python train.py experiment=hyena \
  data.train_data_path="$DATA" \
  data.batch_size=64 \
  trainer.mesh_axes='[dp]' \
  logger=csv \
  "$@"
