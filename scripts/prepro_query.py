#!/usr/bin/env python
"""CLI: TVR/TVQA/VIOLIN query jsonl → query herostore db
(reference scripts/prepro_query.py)."""

import argparse
import json
import sys

sys.path.insert(0, ".")

from hero_tpu.prepro.build_dbs import build_qa_query_db, build_query_db
from hero_tpu.prepro.tokenize import get_tokenizer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--query_jsonl", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--task", default="tvr",
                   choices=["tvr", "didemo", "msrvtt", "tvqa", "how2qa",
                            "violin"])
    p.add_argument("--tokenizer", default="roberta",
                   choices=["roberta", "hash"])
    args = p.parse_args()

    with open(args.query_jsonl) as f:
        items = [json.loads(l) for l in f if l.strip()]
    tok = get_tokenizer(args.tokenizer)
    if args.task in ("tvqa", "how2qa"):
        build_qa_query_db(args.output, items, tok)
    else:
        build_query_db(args.output, items, tok)
    print(f"wrote {len(items)} queries to {args.output}")


if __name__ == "__main__":
    main()
