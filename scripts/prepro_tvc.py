#!/usr/bin/env python
"""CLI: TVC caption jsonl → cap.db herostore (reference scripts/prepro_tvc.py).

Input rows: {"vid_name", "ts": [st, ed], "clip_id",
"descs": [{"desc_id", "desc"}]}.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

from hero_tpu.prepro.build_dbs import build_caption_db
from hero_tpu.prepro.tokenize import get_tokenizer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--caption_jsonl", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--tokenizer", default="roberta",
                   choices=["roberta", "hash"])
    args = p.parse_args()

    with open(args.caption_jsonl) as f:
        items = [json.loads(l) for l in f if l.strip()]
    build_caption_db(args.output, items, get_tokenizer(args.tokenizer))
    print(f"wrote captions for {len(items)} clips to {args.output}")


if __name__ == "__main__":
    main()
