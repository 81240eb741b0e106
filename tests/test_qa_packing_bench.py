"""tools/qa_packing_bench.py host-side assembly: the TV-distribution
corpus writer must produce loadable stores, the driver bucket machinery
must size both layouts, and the packed/unpacked QA batches must carry
identical content (same sub+appended-QA token multiset per question) —
the invariant that makes the measured speedup an apples-to-apples A/B.
(The train-step timing itself runs on the real chip; this pins the
wiring so the tool can't silently measure different data per layout.)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from qa_packing_bench import write_tv_corpus  # noqa: E402

from hero_tpu.data.downstream_tasks import VideoQaDataset, build_batch
from hero_tpu.data.store import QueryTokStore, SubTokStore, VideoFeatStore
from hero_tpu.data.video import (VideoFeatSubTokDataset, suggest_shapes,
                                 suggest_packed_shapes)


def test_qa_bench_corpus_and_layout_content(tmp_path):
    dbs = write_tv_corpus(str(tmp_path), n_videos=3, vfeat_dim=16,
                          vocab=256, seed=0)
    sub_store = SubTokStore(dbs["sub"], max_clip_len=100)
    vfeat = VideoFeatStore(dbs["vfeat"], max_clip_len=100)
    qdb = QueryTokStore(dbs["qa"])

    # TV distribution reaches the stores: 13-20 subs/video, >=40 frames
    n_subs = [len(v) for v in sub_store.vid_sub2frame.values()]
    assert min(n_subs) >= 10 and max(n_subs) <= 24
    assert all(nf >= 40 for nf in sub_store.id2len.values())

    app = max(2 + len(qdb[q]["input_ids"][0])
              + max(len(a) for a in qdb[q]["input_ids"][1:])
              for q in qdb.id2len)
    sp_u = suggest_shapes(sub_store, coverage=1.0, max_txt_len=60,
                          append_len=app).replace(vfeat_dim=16)
    sp_p = suggest_packed_shapes(sub_store, coverage=1.0, max_txt_len=60,
                                 append_len=app).replace(vfeat_dim=16)
    db_u = VideoFeatSubTokDataset(sub_store, vfeat, sp_u, max_txt_len=60)
    db_p = VideoFeatSubTokDataset(sub_store, vfeat, sp_p, max_txt_len=60,
                                  pack=True)
    qids = sorted(qdb.id2len)[:2]

    def qa_batch(db):
        ds = VideoQaDataset(qids, db, qdb, qa_len=-(-(app + 2) // 8) * 8)
        return build_batch(ds, list(range(len(qids))), flatten_rows=True)

    bu, bp = qa_batch(db_u), qa_batch(db_p)
    # same rows-per-question structure (Nq*A leading axis) either way
    assert bu["sub_input_ids"].shape[0] == bp["sub_input_ids"].shape[0]
    assert "sub_txt_seg" in bp and "sub_txt_seg" not in bu
    # identical content: per flattened row group, the valid-token multiset
    # (subs + per-sub appended [SEP] q [SEP] a copies) must match exactly
    for row in range(bu["sub_input_ids"].shape[0]):
        tu = bu["sub_input_ids"][row][bu["sub_txt_mask"][row] > 0]
        tp = bp["sub_input_ids"][row][bp["sub_txt_mask"][row] > 0]
        assert sorted(tu.tolist()) == sorted(tp.tolist()), row
    np.testing.assert_array_equal(bu["qa_input_ids"], bp["qa_input_ids"])
    np.testing.assert_array_equal(bu["targets"], bp["targets"])
