#!/usr/bin/env bash
# Batch-inference driver (reference: scripts/run_eval.sh).
set -euo pipefail
CKPT=${1:?usage: run_eval.sh ckpt path/to/predict.parquet [overrides...]}
DATA=${2:?need predict data}
shift 2 || true
python eval.py ckpt_path="$CKPT" +data.predict_data_path="$DATA" data.batch_size=24 "$@"
