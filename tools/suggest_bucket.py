"""Recommend `--bucket_*` flags for a corpus, unpacked or packed.

The fixed-shape pipeline compiles one program per bucket; this CLI sizes
the bucket from the corpus' shape statistics (the prepro sidecar when
present, else one scan) so users don't hand-tune slot budgets:

    # pretrain / VCMR sub bucket
    python tools/suggest_bucket.py --sub_txt_db /db/tv_sub \
        --max_txt_len 60 --sub_ctx_len 1 --coverage 0.99 [--pack]

    # downstream task budgets (qa/statement/caption/clip lengths)
    python tools/suggest_bucket.py --task tvqa --query_txt_db /db/tvqa \
        --sub_txt_db /db/tv_sub [--pack]
    python tools/suggest_bucket.py --task violin --query_txt_db /db/violin
    python tools/suggest_bucket.py --task tvc --cap_db /db/tvc_cap_root

Unpacked mode prints the per-dimension quantile bucket
(``suggest_shapes``); ``--pack`` searches (rows x text x frame) budgets
under the ACTUAL first-fit packer for the cheapest bucket packing
>= coverage of videos with zero drops (``suggest_packed_shapes``) —
the occupancy-driven counterpart of the reference's in-batch-max dynamic
padding (/root/reference/data/data.py:406-512), which sizes every batch
at runtime instead of compile time.  For QA/VIOLIN the appended
question/statement budget is folded into the per-row (or per-segment)
text budget, since ``video_item(append_ids=...)`` replicates those
tokens into every sub row/segment.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(
        description="suggest --bucket_* flags for a corpus")
    ap.add_argument("--sub_txt_db", default=None)
    ap.add_argument("--task", default="pretrain",
                    help="pretrain (sub bucket only) | tvqa/how2qa | "
                         "violin | tvc — downstream tasks also size "
                         "their qa/statement/caption budgets")
    ap.add_argument("--query_txt_db", default=None,
                    help="QA/VIOLIN query db (qa_len / stmt_len source)")
    ap.add_argument("--cap_db", default=None,
                    help="TVC caption db root (cap_len/seg_len/"
                         "clips_per_item source)")
    ap.add_argument("--max_clip_len", type=int, default=100)
    ap.add_argument("--max_txt_len", type=int, default=60)
    ap.add_argument("--sub_ctx_len", type=int, default=0)
    ap.add_argument("--vfeat_interval", type=float, default=1.5)
    ap.add_argument("--coverage", type=float, default=0.99,
                    help="fraction of videos the bucket must hold "
                         "untruncated (the rest route to "
                         "--second_bucket)")
    ap.add_argument("--pack", action="store_true",
                    help="size a --pack_subs bucket (rows hold several "
                         "subs) instead of one-sub-per-row")
    a = ap.parse_args()

    from hero_tpu.data.downstream_tasks import suggest_downstream_lens
    from hero_tpu.data.store import SubTokStore
    from hero_tpu.data.video import (FixedShapes, suggest_packed_shapes,
                                     suggest_shapes)

    flags = {}
    append_len = 0
    if a.task in ("tvqa", "how2qa", "videoqa"):
        assert a.query_txt_db, "--task tvqa needs --query_txt_db"
        flags.update(suggest_downstream_lens(
            a.task, a.query_txt_db, coverage=a.coverage))
        append_len = flags["bucket_query_len"]
    elif a.task == "violin":
        assert a.query_txt_db, "--task violin needs --query_txt_db"
        flags.update(suggest_downstream_lens(
            a.task, a.query_txt_db, coverage=a.coverage))
        append_len = flags["bucket_query_len"]
    elif a.task == "tvc":
        assert a.cap_db, "--task tvc needs --cap_db"
        flags.update(suggest_downstream_lens(
            a.task, a.cap_db, coverage=a.coverage,
            frame_interval=a.vfeat_interval,
            max_clip_len=a.max_clip_len))

    if a.sub_txt_db:
        sub = SubTokStore(a.sub_txt_db, max_clip_len=a.max_clip_len)
        fn = suggest_packed_shapes if a.pack else suggest_shapes
        sp = fn(sub, coverage=a.coverage, max_txt_len=a.max_txt_len,
                sub_ctx_len=a.sub_ctx_len, base=FixedShapes(n_frames=8),
                append_len=append_len)
        flags.update({
            "bucket_n_subs": sp.n_subs,
            "bucket_txt_len": sp.txt_len,
            "bucket_frames_per_sub": sp.frames_per_sub,
            # max_clip_len is a CLAMP (videos slice to it): the user's
            # value wins when the corpus quantile exceeds it
            "max_clip_len": min(a.max_clip_len, sp.n_frames),
        })
    print(json.dumps(dict(flags, pack_subs=bool(a.pack), task=a.task,
                          coverage=a.coverage)))
    cli = " ".join(f"--{k} {v}" for k, v in flags.items())
    if a.pack:
        cli += " --pack_subs"
    print(f"# {cli}", file=sys.stderr)


if __name__ == "__main__":
    main()
