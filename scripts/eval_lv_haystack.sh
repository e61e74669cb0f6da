#!/usr/bin/env bash
# Three-stage LV-Haystack evaluation pipeline (reference eval_LV_Haystack.sh):
#   1. batch T* search over the dataset     -> results/frame_search/*.json
#   2. keyframe-search metrics              -> results/lvhaystack_score/*.json
#   3. QA accuracy on the searched frames   -> results/qa_version/*.json
#
# Configure via env vars; defaults mirror the reference pipeline (grounder
# gpt-4o, heuristic yolo-world, split test_tiny, TStar sampling for QA).
set -euo pipefail

GROUNDER="${GROUNDER:-gpt-4o}"
HEURISTIC="${HEURISTIC:-yolo-world}"
SPLIT="${SPLIT:-test_tiny}"
VIDEO_ROOT="${VIDEO_ROOT:-./Datasets/ego4d_data/ego4d_data/v1/256p}"
OUTPUT_NAME="${OUTPUT_NAME:-TStar_LongVideoHaystack_tiny.json}"
QA_BACKEND="${QA_BACKEND:-${GROUNDER}}"
NFRAMES="${NFRAMES:-8}"
LOCAL_JSON="${LOCAL_JSON:-}"          # offline dataset dump (optional)
CHECKPOINT_DIR="${CHECKPOINT_DIR:-}"  # detector weights (optional)

EXTRA=()
[ -n "$LOCAL_JSON" ] && EXTRA+=(--local_json "$LOCAL_JSON")
[ -n "$CHECKPOINT_DIR" ] && EXTRA+=(--checkpoint_dir "$CHECKPOINT_DIR")

echo "=== stage 1/3: batch T* search ==="
python -m tstar_tpu.cli.dataset \
    --split "$SPLIT" \
    --video_root "$VIDEO_ROOT" \
    --grounder "$GROUNDER" \
    --heuristic "$HEURISTIC" \
    --search_nframes "$NFRAMES" \
    --output_json_name "$OUTPUT_NAME" \
    "${EXTRA[@]}"

RESULTS="./results/frame_search/${HEURISTIC}_${OUTPUT_NAME}"

echo "=== stage 2/3: keyframe-search metrics ==="
python -m tstar_tpu.cli.evaluate search \
    --search_result_path "$RESULTS"

echo "=== stage 3/3: QA accuracy (TStar sampling) ==="
python -m tstar_tpu.cli.evaluate qa \
    --backend "$QA_BACKEND" \
    --json_file "$RESULTS" \
    --sampling_type TStar \
    --num_frame "$NFRAMES"
