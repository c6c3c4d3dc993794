#!/usr/bin/env bash
# SfM mapping for custom image collections with the COLMAP CLI.
# Capability parity with the reference scripts/preprocess/colmap_mapping.sh:
# feature extraction -> vocab-tree matching -> incremental mapping ->
# manhattan-world orientation alignment. Produces the sparse/ (and
# sparse/manhattan_world/) model folders that train.py / train_admm.py and
# preprocess_large_scale_data.py consume (dataset.model_folder config key).
#
# Usage:
#   colmap_mapping.sh DATASET_PATH OUTPUT_PATH VOC_TREE_PATH [NUM_SIMILAR] [NUM_THREADS]
#
# DATASET_PATH must contain an images/ folder. COLMAP is an external tool
# (not bundled); install it from https://colmap.github.io. CPU-only
# extraction/matching is used so the script works on TPU hosts without CUDA.
set -euo pipefail

DATASET_PATH=${1:?usage: colmap_mapping.sh DATASET_PATH OUTPUT_PATH VOC_TREE_PATH [NUM_SIMILAR] [NUM_THREADS]}
OUTPUT_PATH=${2:?missing OUTPUT_PATH}
VOC_TREE_PATH=${3:?missing VOC_TREE_PATH}
MOST_SIMILAR_IMAGES_NUM=${4:-50}
NUM_THREADS=${5:-$(nproc)}

COLMAP_EXE=${COLMAP_EXE:-colmap}
command -v "$COLMAP_EXE" >/dev/null || {
    echo "error: colmap binary not found (set COLMAP_EXE or install COLMAP)" >&2
    exit 1
}

mkdir -p "$OUTPUT_PATH/sparse" "$OUTPUT_PATH/sparse/manhattan_world"

"$COLMAP_EXE" feature_extractor \
    --database_path="$OUTPUT_PATH/database.db" \
    --image_path="$DATASET_PATH/images" \
    --SiftExtraction.num_threads="$NUM_THREADS" \
    --SiftExtraction.use_gpu=0 \
    --SiftExtraction.estimate_affine_shape=true \
    --SiftExtraction.domain_size_pooling=true \
    --ImageReader.camera_model PINHOLE \
    --ImageReader.single_camera 1 \
    --SiftExtraction.max_num_features 8192 \
    > "$DATASET_PATH/log_extract_feature.txt" 2>&1

"$COLMAP_EXE" vocab_tree_matcher \
    --database_path="$OUTPUT_PATH/database.db" \
    --SiftMatching.num_threads="$NUM_THREADS" \
    --SiftMatching.use_gpu=0 \
    --SiftMatching.guided_matching=false \
    --VocabTreeMatching.num_images="$MOST_SIMILAR_IMAGES_NUM" \
    --VocabTreeMatching.num_nearest_neighbors=5 \
    --VocabTreeMatching.vocab_tree_path="$VOC_TREE_PATH" \
    > "$DATASET_PATH/log_match.txt" 2>&1

"$COLMAP_EXE" mapper \
    --database_path="$OUTPUT_PATH/database.db" \
    --image_path="$DATASET_PATH/images" \
    --output_path="$OUTPUT_PATH/sparse" \
    --Mapper.num_threads="$NUM_THREADS" \
    > "$DATASET_PATH/log_sfm.txt" 2>&1

# Manhattan-world alignment (consumed via dataset.use_manhattan_world +
# dataset.model_folder=sparse/manhattan_world).
"$COLMAP_EXE" model_orientation_aligner \
    --image_path="$DATASET_PATH/images" \
    --input_path="$OUTPUT_PATH/sparse/0" \
    --output_path="$OUTPUT_PATH/sparse/manhattan_world" \
    > "$DATASET_PATH/log_align_manhattan_world.txt" 2>&1

echo "sparse model written to $OUTPUT_PATH/sparse (manhattan_world aligned copy included)"
