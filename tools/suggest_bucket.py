"""Recommend `--bucket_*` flags for a corpus, unpacked or packed.

The fixed-shape pipeline compiles one program per bucket; this CLI sizes
the bucket from the corpus' shape statistics (the prepro sidecar when
present, else one scan) so users don't hand-tune slot budgets:

    python tools/suggest_bucket.py --sub_txt_db /db/tv_sub \
        --max_txt_len 60 --sub_ctx_len 1 --coverage 0.99 [--pack]

Unpacked mode prints the per-dimension quantile bucket
(``suggest_shapes``); ``--pack`` searches (rows x text x frame) budgets
under the ACTUAL first-fit packer for the cheapest bucket packing
>= coverage of videos with zero drops (``suggest_packed_shapes``) —
the occupancy-driven counterpart of the reference's in-batch-max dynamic
padding (/root/reference/data/data.py:406-512), which sizes every batch
at runtime instead of compile time.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(
        description="suggest --bucket_* flags for a sub-token db")
    ap.add_argument("--sub_txt_db", required=True)
    ap.add_argument("--max_clip_len", type=int, default=100)
    ap.add_argument("--max_txt_len", type=int, default=60)
    ap.add_argument("--sub_ctx_len", type=int, default=0)
    ap.add_argument("--coverage", type=float, default=0.99,
                    help="fraction of videos the bucket must hold "
                         "untruncated (the rest route to "
                         "--second_bucket)")
    ap.add_argument("--pack", action="store_true",
                    help="size a --pack_subs bucket (rows hold several "
                         "subs) instead of one-sub-per-row")
    a = ap.parse_args()

    from hero_tpu.data.store import SubTokStore
    from hero_tpu.data.video import (FixedShapes, suggest_packed_shapes,
                                     suggest_shapes)
    sub = SubTokStore(a.sub_txt_db, max_clip_len=a.max_clip_len)
    fn = suggest_packed_shapes if a.pack else suggest_shapes
    sp = fn(sub, coverage=a.coverage, max_txt_len=a.max_txt_len,
            sub_ctx_len=a.sub_ctx_len, base=FixedShapes(n_frames=8))
    flags = {
        "bucket_n_subs": sp.n_subs,
        "bucket_txt_len": sp.txt_len,
        "bucket_frames_per_sub": sp.frames_per_sub,
        # max_clip_len is a CLAMP (videos slice to it): the user's value
        # wins when the corpus quantile exceeds it
        "max_clip_len": min(a.max_clip_len, sp.n_frames),
    }
    print(json.dumps(dict(flags, pack_subs=bool(a.pack),
                          coverage=a.coverage)))
    cli = " ".join(f"--{k} {v}" for k, v in flags.items())
    if a.pack:
        cli += " --pack_subs"
    print(f"# {cli}", file=sys.stderr)


if __name__ == "__main__":
    main()
