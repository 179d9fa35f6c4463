#!/usr/bin/env bash
# Hand-sharded chunk evaluation + merge.
#
# Reference parity: the reference operationalizes large predict jobs as a
# bash loop of one eval.py run per pre-chunked parquet file
# (scripts/runforp2.sh:52-76), a per-chunk prediction collection pass
# (scripts/getforp2.sh:26-56), and a final cat merge (scripts/collectp2.sh:5-13).
# This driver is the one-command equivalent of all three phases.
#
# NOTE: for BAM inputs the framework's multi-process predict CLI subsumes
# hand-sharding entirely —
#   chimeralm predict data.bam --coordinator host:0 --num-processes N --process-id i
# stripes reads per host and writes rank-stamped outputs that `chimeralm
# filter` consumes directly.  shard_eval.sh remains for the reference's
# workflow shape: a directory of pre-chunked parquet files, one eval.py run
# each, restartable per chunk.
#
# Usage:
#   scripts/shard_eval.sh CKPT_PATH OUT_BASE CHUNK.parquet... [-- OVERRIDE...]
#
#   CKPT_PATH   Trainer .ckpt.msgpack or a from_pretrained directory
#   OUT_BASE    per-chunk outputs land in OUT_BASE/chunk_<i>/, merged file
#               at OUT_BASE/predicts.txt
#   OVERRIDE    extra eval.py overrides after `--` (e.g. data.batch_size=24
#               model.model.config._target_=...)
set -euo pipefail

if [[ $# -lt 3 ]]; then
    grep '^#' "$0" | sed 's/^# \{0,1\}//' | head -25
    exit 2
fi

CKPT=$1; shift
OUT_BASE=$1; shift

CHUNKS=()
while [[ $# -gt 0 && $1 != "--" ]]; do CHUNKS+=("$1"); shift; done
[[ $# -gt 0 ]] && shift  # drop the --
OVERRIDES=("$@")

REPO=$(cd "$(dirname "$0")/.." && pwd)
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p "$OUT_BASE"

log() { echo "[$(date '+%H:%M:%S')] $*"; }

failed=()
i=0
for chunk in "${CHUNKS[@]}"; do
    i=$((i + 1))
    out_dir="$OUT_BASE/chunk_$i"
    # resume keys on chunk IDENTITY, not position: a finished dir is only
    # skipped if it was produced from the same source file
    if [[ -f "$out_dir/predicts.txt" ]]; then
        if [[ "$(cat "$out_dir/source.txt" 2>/dev/null)" == "$chunk" ]]; then
            log "chunk $i already collected, skipping ($out_dir/predicts.txt)"
            continue
        fi
        log "ERROR: $out_dir holds results for '$(cat "$out_dir/source.txt" 2>/dev/null)'," \
            "not '$chunk' — use a fresh OUT_BASE (stale results are never merged)"
        exit 1
    fi
    [[ -f "$chunk" ]] || { log "WARNING: chunk file missing: $chunk"; }
    log "chunk $i/${#CHUNKS[@]}: $chunk -> $out_dir"
    if python "$REPO/eval.py" \
        "ckpt_path=$CKPT" \
        "+data.predict_data_path=$chunk" \
        "data.train_data_path=$chunk" \
        "paths.output_dir=$out_dir" \
        "extras.print_config=false" \
        "${OVERRIDES[@]+"${OVERRIDES[@]}"}"; then
        # phase 2 (getforp2 equivalent): per-chunk name\tlabel collection
        python "$REPO/scripts/get_result_from_predictions.py" collect \
            "$out_dir/predictions" --output-path "$out_dir/predicts.txt"
        printf '%s' "$chunk" > "$out_dir/source.txt"
        log "chunk $i done"
    else
        log "ERROR: chunk $i failed"
        failed+=("$chunk")
    fi
done

if [[ ${#failed[@]} -gt 0 ]]; then
    log "FAILED chunks: ${failed[*]} — rerun the same command (finished chunks are skipped)"
    exit 1
fi

# phase 3 (collectp2 equivalent): concatenate THIS invocation's chunks only
# (an explicit index list, not a glob — leftover chunk dirs from a previous
# run with a different chunk list must never leak into the merge)
merge_files=()
for ((j = 1; j <= ${#CHUNKS[@]}; j++)); do
    merge_files+=("$OUT_BASE/chunk_$j/predicts.txt")
done
cat "${merge_files[@]}" > "$OUT_BASE/predicts.txt"
log "merged $(wc -l < "$OUT_BASE/predicts.txt") predictions -> $OUT_BASE/predicts.txt"
