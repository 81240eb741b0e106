"""Sub packing (hero_tpu/data/packing.py): packed rows must be
numerically equivalent to unpacked rows in eval mode.

Exactness argument: cross-segment attention scores carry the same -1e4
bias as masked keys, whose softmax contribution underflows to exactly 0
in fp32; every other op in the f-encoder (LN, FFN, embeddings) is
per-token.  The clip-timeline scatter/gather are keyed per-slot by
``sub_frame_idx``, so the c-encoder sees identical inputs either way
(up to fp reduction-order noise in the one-hot scatter matmul).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hero_tpu.config.model_config import tiny_hero_config
from hero_tpu.data import pretrain_tasks as pt
from hero_tpu.data.packing import Placement, pack_subs
from hero_tpu.data.store import SubTokStore, VideoFeatStore
from hero_tpu.data.testing import build_synthetic_corpus
from hero_tpu.data.video import (FixedShapes, VideoFeatSubTokDataset,
                                 stack_items)
from hero_tpu.models import model as backbone

MAX_FRAMES = 16
# unpacked bucket: one sub per row.  packed bucket: 2 rows whose slot
# budgets hold everything the unpacked bucket holds (max_txt_len=8 keeps
# every sub under both caps, so neither layout truncates text).
UNPACKED = FixedShapes(n_subs=4, txt_len=24, frames_per_sub=16,
                       n_frames=MAX_FRAMES, n_queries=2, query_len=16,
                       max_masked=6, vfeat_dim=64)
PACKED = FixedShapes(n_subs=2, txt_len=48, frames_per_sub=32,
                     n_frames=MAX_FRAMES, n_queries=2, query_len=16,
                     max_masked=12, vfeat_dim=64)


def test_pack_subs_first_fit_and_overflow():
    pls = pack_subs([(10, 3), (12, 2), (30, 4), (5, 0), (35, 1)],
                    n_rows=2, txt_len=40, frames_per_sub=8)
    assert pls[0] == Placement(0, 0, 0, 10, 0, 3)
    assert pls[1] == Placement(0, 1, 10, 12, 3, 2)
    assert pls[2] == Placement(1, 0, 0, 30, 0, 4)
    assert pls[3] == Placement(0, 2, 22, 5, 5, 0)   # 0-frame sub packs
    assert pls[4] is None                            # no row has 35 slots

    # segment cap: at most max_segs subs per row
    pls = pack_subs([(1, 1)] * 5, n_rows=2, txt_len=40, frames_per_sub=8,
                    max_segs=3)
    assert [p.row for p in pls] == [0, 0, 0, 1, 1]
    assert [p.seg for p in pls] == [0, 1, 2, 0, 1]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pack_corpus"))
    return build_synthetic_corpus(root, n_videos=4, max_frames=MAX_FRAMES,
                                  vfeat_dim=64)


@pytest.fixture(scope="module")
def dbs(corpus):
    sub = SubTokStore(corpus["sub"], max_clip_len=MAX_FRAMES)
    vfeat = VideoFeatStore(corpus["vfeat"], max_clip_len=MAX_FRAMES)
    plain = VideoFeatSubTokDataset(sub, vfeat, UNPACKED, max_txt_len=8)
    packed = VideoFeatSubTokDataset(sub, vfeat, PACKED, max_txt_len=8,
                                    pack=True)
    return plain, packed


def test_packed_item_structure(dbs):
    plain, packed = dbs
    a, b = plain.video_item("vid0"), packed.video_item("vid0")
    assert b["sub_txt_seg"].shape == (2, 48)
    assert b["sub_frame_seg"].shape == (2, 32)
    # identical token multiset survives packing (no drops at this bucket)
    va = a["sub_input_ids"][a["sub_txt_mask"] > 0]
    vb = b["sub_input_ids"][b["sub_txt_mask"] > 0]
    assert sorted(va.tolist()) == sorted(vb.tolist())
    # same frame occurrences
    fa = a["sub_frame_idx"][a["sub_frame_mask"] > 0]
    fb = b["sub_frame_idx"][b["sub_frame_mask"] > 0]
    assert sorted(fa.tolist()) == sorted(fb.tolist())
    # seg ids valid exactly where masks are valid
    assert ((b["sub_txt_seg"] >= 0) == (b["sub_txt_mask"] > 0)).all()
    assert ((b["sub_frame_seg"] >= 0) == (b["sub_frame_mask"] > 0)).all()
    # per-segment positions restart at 0
    first = b["sub_txt_pos"][b["sub_txt_seg"] >= 0]
    assert first.min() == 0
    assert packed.truncation_report()["subs_dropped"] == 0


def _batch(db, vids, extra=None):
    items = [db.video_item(v) for v in vids]
    out = stack_items(items)
    if extra:
        out.update(extra)
    return {k: jnp.asarray(v) for k, v in out.items()}


def test_forward_repr_packed_equivalence(dbs):
    plain, packed = dbs
    cfg = tiny_hero_config()
    params = backbone.init_hierarchical_vl_model(jax.random.PRNGKey(0),
                                                 cfg)
    vids = ["vid0", "vid1", "vid2"]
    a = backbone.forward_repr(params, cfg, _batch(plain, vids))
    b = backbone.forward_repr(params, cfg, _batch(packed, vids))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-4, rtol=2e-4)


def test_forward_mlm_packed_equivalence(dbs):
    """Same rng stream → identical masked tokens/labels; packed loss sum
    and count must match the unpacked ones."""
    plain, packed = dbs
    cfg = tiny_hero_config()
    params = backbone.init_hierarchical_vl_model(jax.random.PRNGKey(1),
                                                 cfg)
    vids = [f"vid{i}" for i in range(3)]
    da = pt.MlmDataset(vids, plain, mask_prob=0.3, seed=7)
    db_ = pt.MlmDataset(vids, packed, mask_prob=0.3, seed=7)
    ba = {k: jnp.asarray(v) for k, v in pt.build_batch(da, [0, 1, 2]).items()}
    bb = {k: jnp.asarray(v) for k, v in pt.build_batch(db_, [0, 1, 2]).items()}
    # identical labels (multiset per video)
    la = np.asarray(ba["mlm_labels"])
    lb = np.asarray(bb["mlm_labels"])
    for i in range(3):
        assert sorted(la[i][la[i] >= 0].tolist()) == \
            sorted(lb[i][lb[i] >= 0].tolist())
    sa, na = backbone.forward_mlm(params, cfg, ba)
    sb, nb = backbone.forward_mlm(params, cfg, bb)
    assert int(na) == int(nb)
    np.testing.assert_allclose(float(sa), float(sb), rtol=1e-4)


def test_suggest_packed_shapes(corpus):
    """Occupancy-driven packed-bucket sizing: the suggested bucket must
    (a) pack >= coverage of videos with zero drops under the real
    dataset, and (b) cost fewer row slots than the unpacked suggestion
    at the same coverage (the point of packing)."""
    from hero_tpu.data.video import (suggest_packed_shapes,
                                     suggest_shapes, video_fits_bucket)
    sub = SubTokStore(corpus["sub"], max_clip_len=MAX_FRAMES)
    vfeat = VideoFeatStore(corpus["vfeat"], max_clip_len=MAX_FRAMES)
    base = UNPACKED.replace(n_frames=MAX_FRAMES)
    packed_sp = suggest_packed_shapes(sub, coverage=1.0, max_txt_len=8,
                                      base=base)
    unpacked_sp = suggest_shapes(sub, coverage=1.0, max_txt_len=8,
                                 base=base)
    db = VideoFeatSubTokDataset(sub, vfeat, packed_sp, max_txt_len=8,
                                pack=True)
    for vid in db.vids:
        assert video_fits_bucket(db, vid), (vid, packed_sp)
        db.video_item(vid)
    assert db.truncation_report()["subs_dropped"] == 0
    cost = lambda sp: sp.n_subs * (sp.txt_len + sp.frames_per_sub)
    assert cost(packed_sp) <= cost(unpacked_sp), (packed_sp, unpacked_sp)


def test_qa_tasks_refuse_packed_db(dbs, corpus):
    """VideoQA/VIOLIN append shared question text per sub row — a packed
    row's segment mask would silently hide it (appended slots carry seg
    id -1), so the datasets must refuse a packed video_db loudly."""
    from hero_tpu.data.downstream_tasks import (TvcTrainDataset,
                                                VideoQaDataset,
                                                ViolinDataset)
    from hero_tpu.data.store import QueryTokStore
    _, packed = dbs
    qdb = QueryTokStore(corpus["query"])
    with pytest.raises(ValueError, match="pack_subs"):
        VideoQaDataset(list(qdb.id2len), packed, qdb)
    with pytest.raises(ValueError, match="pack_subs"):
        ViolinDataset(list(qdb.id2len), packed, qdb)
    # TVC only adds caption/clip keys (never rewrites sub rows): allowed


def test_forward_mfm_packed_equivalence(dbs):
    plain, packed = dbs
    cfg = tiny_hero_config()
    params = backbone.init_hierarchical_vl_model(jax.random.PRNGKey(2),
                                                 cfg)
    vids = ["vid0", "vid1"]
    rng = np.random.RandomState(3)
    mask = (rng.rand(2, MAX_FRAMES) < 0.2).astype(np.float32)
    extra = {"c_v_masks": mask}
    sa, na = backbone.forward_mfm(params, cfg, _batch(plain, vids, extra),
                                  loss="regression")
    sb, nb = backbone.forward_mfm(params, cfg, _batch(packed, vids, extra),
                                  loss="regression")
    assert int(na) == int(nb)
    np.testing.assert_allclose(float(sa), float(sb), rtol=1e-4)
