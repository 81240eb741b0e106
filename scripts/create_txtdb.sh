#!/usr/bin/env bash
# Build TVR text dbs from the public annotations (reference
# scripts/create_txtdb.sh — minus the docker wrapper: hero_tpu's prepro
# CLIs run in the ambient environment, see pyproject.toml).
#
#   bash scripts/create_txtdb.sh <out_dir> <ann_dir> [vid2nframe.json]
#
# Downloads the TVRetrieval release annotations when absent, then runs
# scripts/prepro_query.py per split.  Subtitle dbs additionally need the
# video frame counts (id2nframe.json from convert_videodb.py): pass its
# path as the third argument to also build tv_subtitles.db.
set -e

OUT_DIR=${1:?usage: create_txtdb.sh <out_dir> <ann_dir> [vid2nframe.json]}
ANN_DIR=${2:?usage: create_txtdb.sh <out_dir> <ann_dir> [vid2nframe.json]}
VID2NFRAME=$3

URL='https://raw.githubusercontent.com/jayleicn/TVRetrieval/master/data'
mkdir -p "$OUT_DIR" "$ANN_DIR"

for SPLIT in train val test_public; do
    if [ ! -f "$ANN_DIR/tvr_$SPLIT.jsonl" ]; then
        echo "downloading $SPLIT annotations..."
        wget "$URL/tvr_${SPLIT}_release.jsonl" -O "$ANN_DIR/tvr_$SPLIT.jsonl"
    fi
    echo "preprocessing tvr $SPLIT annotations..."
    python scripts/prepro_query.py \
        --query_jsonl "$ANN_DIR/tvr_$SPLIT.jsonl" \
        --task tvr \
        --output "$OUT_DIR/tvr_${SPLIT}.db"
done

if [ -n "$VID2NFRAME" ]; then
    if [ ! -f "$ANN_DIR/tvqa_preprocessed_subtitles.jsonl" ]; then
        echo "downloading tv subtitles..."
        wget "$URL/tvqa_preprocessed_subtitles.jsonl" \
            -O "$ANN_DIR/tvqa_preprocessed_subtitles.jsonl"
    fi
    echo "preprocessing tv subtitles..."
    python scripts/prepro_sub.py \
        --sub_jsonl "$ANN_DIR/tvqa_preprocessed_subtitles.jsonl" \
        --vid2nframe "$VID2NFRAME" \
        --output "$OUT_DIR/tv_subtitles.db"
fi
