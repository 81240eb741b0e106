#!/usr/bin/env python
"""CLI: subtitles jsonl → sub herostore db (reference scripts/prepro_sub.py).

Input jsonl rows: {"vid_name": str, "sub": [{"text", "start", "end"}]}
plus a vid2nframe json.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

from hero_tpu.prepro.build_dbs import build_sub_db
from hero_tpu.prepro.tokenize import get_tokenizer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sub_jsonl", required=True)
    p.add_argument("--vid2nframe", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--frame_length", default=1.5, type=float)
    p.add_argument("--split", default="train")
    p.add_argument("--tokenizer", default="roberta",
                   choices=["roberta", "hash"])
    args = p.parse_args()

    with open(args.vid2nframe) as f:
        vid2nframe = json.load(f)
    vid2subs = {}
    with open(args.sub_jsonl) as f:
        for line in f:
            if line.strip():
                d = json.loads(line)
                vid2subs[d["vid_name"]] = d["sub"]
    build_sub_db(args.output, vid2subs, vid2nframe, args.frame_length,
                 get_tokenizer(args.tokenizer), split=args.split)


if __name__ == "__main__":
    main()
