#!/usr/bin/env bash
# Download the released HERO datasets / checkpoints from the public blob
# (reference scripts/download_{tvr,tvqa,tvc,violin,didemo,msrvtt,tv_pretrain,
# pretrained}.sh — consolidated into one dataset-keyed CLI).
#
#   bash scripts/download_data.sh <download_dir> <dataset> [...]
#   datasets: tvr tvqa tvc violin didemo msrvtt tv_pretrain pretrained
#
# The released archives are LMDB text/video dbs; convert each to a
# herostore with  python scripts/convert_lmdb.py --src <db> --dst <out>
# (readable directly too — hero_tpu's store layer falls back to lmdb).
set -e

DOWNLOAD=${1:?usage: download_data.sh <download_dir> <dataset> [...]}
shift

BLOB='https://convaisharables.blob.core.windows.net/hero'
TVR_ANN='https://raw.githubusercontent.com/jayleicn/TVRetrieval/master/data'
TVC_ANN='https://raw.githubusercontent.com/jayleicn/TVCaption/master/data'

mkdir -p "$DOWNLOAD"/{video_db,txt_db,pretrained,finetune}

fetch_tar () {  # $1 = blob-relative path, $2 = dest subdir
    local name; name=$(basename "$1")
    if [ ! -e "$DOWNLOAD/$2/${name%.tar}" ]; then
        wget "$BLOB/$1" -P "$DOWNLOAD/$2/"
        tar -xf "$DOWNLOAD/$2/$name" -C "$DOWNLOAD/$2"
        rm "$DOWNLOAD/$2/$name"
    fi
}

fetch_file () {  # $1 = blob-relative path, $2 = dest subdir
    local name; name=$(basename "$1")
    [ -f "$DOWNLOAD/$2/$name" ] || wget "$BLOB/$1" -P "$DOWNLOAD/$2/"
}

for DATASET in "$@"; do
case "$DATASET" in
tvr)
    fetch_tar video_db/tv.tar video_db
    for SPLIT in train val test_public; do
        fetch_tar "txt_db/tvr_$SPLIT.db.tar" txt_db
    done
    fetch_tar txt_db/tv_subtitles.db.tar txt_db
    fetch_file pretrained/hero-tv-ht100.pt pretrained
    fetch_tar finetune/tvr_default.tar finetune
    ;;
tvqa)
    fetch_tar video_db/tv.tar video_db
    for SPLIT in train val test_public; do
        fetch_tar "txt_db/tvqa_$SPLIT.db.tar" txt_db
    done
    fetch_tar txt_db/tv_subtitles.db.tar txt_db
    fetch_file pretrained/hero-tv-ht100.pt pretrained
    ;;
tvc)
    fetch_tar video_db/tv.tar video_db
    for SPLIT in train val test_public; do
        fetch_tar "txt_db/tvc_$SPLIT.db.tar" txt_db
    done
    fetch_tar txt_db/tv_subtitles.db.tar txt_db
    wget -nc "$TVC_ANN/tvc_val_release.jsonl" -P "$DOWNLOAD/txt_db" || true
    fetch_file pretrained/hero-tv-ht100.pt pretrained
    ;;
violin)
    fetch_tar video_db/violin.tar video_db
    for SPLIT in train val test; do
        fetch_tar "txt_db/violin_$SPLIT.db.tar" txt_db
    done
    fetch_tar txt_db/violin_subtitles.db.tar txt_db
    fetch_file pretrained/hero-tv-ht100.pt pretrained
    ;;
didemo)
    fetch_tar video_db/didemo.tar video_db
    for SPLIT in train val test; do
        fetch_tar "txt_db/didemo_$SPLIT.db.tar" txt_db
    done
    fetch_tar txt_db/didemo_subtitles.db.tar txt_db
    fetch_file pretrained/hero-tv-ht100.pt pretrained
    ;;
msrvtt)
    fetch_tar video_db/msrvtt.tar video_db
    for SPLIT in train val test; do
        fetch_tar "txt_db/msrvtt_$SPLIT.db.tar" txt_db
    done
    fetch_tar txt_db/msrvtt_subtitles.db.tar txt_db
    fetch_file pretrained/hero-tv-ht100.pt pretrained
    ;;
tv_pretrain)
    fetch_tar video_db/tv.tar video_db
    fetch_tar txt_db/tv_subtitles.db.tar txt_db
    fetch_tar txt_db/pretrain_splits.tar txt_db
    fetch_file pretrained/pretrain-tv-init.bin pretrained
    ;;
pretrained)
    fetch_file pretrained/hero-tv-ht100.pt pretrained
    fetch_file pretrained/pretrain-tv-init.bin pretrained
    ;;
*)
    echo "unknown dataset: $DATASET" >&2; exit 1 ;;
esac
done
