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


def test_videoqa_packed_equivalence(dbs, corpus):
    """Packed VideoQA replicates the ``[SEP] q [SEP] a`` tokens into each
    packed segment (video_item append_ids), so every sub keeps its own
    visible QA copy exactly like the reference's one-row-per-sub layout
    (videoQA.py:93-115).  Forward losses, logits AND grads must match the
    unpacked layout bit-for-tolerance."""
    from hero_tpu.data.downstream_tasks import VideoQaDataset, build_batch
    from hero_tpu.data.store import QueryTokStore
    from hero_tpu.models import videoqa
    plain, packed = dbs
    qdb = QueryTokStore(corpus["qa_query"])
    qids = sorted(qdb.id2len.keys())[:3]
    cfg = tiny_hero_config()
    params = videoqa.init_hero_for_videoqa(jax.random.PRNGKey(4), cfg)

    def qa_batch(db):
        ds = VideoQaDataset(qids, db, qdb, qa_len=16)
        b = build_batch(ds, list(range(len(qids))), flatten_rows=True)
        return {k: jnp.asarray(v) for k, v in b.items()
                if not k.startswith("__")}
    ba, bb = qa_batch(plain), qa_batch(packed)
    # identical appended content in both layouts (multiset per question)
    va = np.asarray(ba["sub_input_ids"])[np.asarray(ba["sub_txt_mask"]) > 0]
    vb = np.asarray(bb["sub_input_ids"])[np.asarray(bb["sub_txt_mask"]) > 0]
    assert sorted(va.tolist()) == sorted(vb.tolist())

    def loss_fn(p, b):
        qa_loss, t_loss = videoqa.forward_videoqa(p, cfg, b,
                                                  num_answers=3)
        return qa_loss + 0.4 * t_loss
    la, lb = loss_fn(params, ba), loss_fn(params, bb)
    np.testing.assert_allclose(float(la), float(lb), rtol=2e-4)
    logits_a = videoqa.forward_videoqa(params, cfg, ba, num_answers=3,
                                       compute_loss=False)
    logits_b = videoqa.forward_videoqa(params, cfg, bb, num_answers=3,
                                       compute_loss=False)
    np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b),
                               atol=3e-4, rtol=3e-4)
    ga = jax.grad(loss_fn)(params, ba)
    gb = jax.grad(loss_fn)(params, bb)
    na = jnp.sqrt(sum(jnp.sum(x * x) for x in jax.tree.leaves(ga)))
    diff = jnp.sqrt(sum(jnp.sum((x - y) ** 2) for x, y in
                        zip(jax.tree.leaves(ga), jax.tree.leaves(gb))))
    assert float(diff) <= 2e-3 * max(float(na), 1e-6), (float(diff),
                                                        float(na))


def test_violin_packed_equivalence(dbs, corpus):
    """Packed VIOLIN: statement tokens replicated per segment ≡ unpacked
    per-row append (reference violin.py:69-85) — loss + grads pinned."""
    from hero_tpu.data.downstream_tasks import ViolinDataset, build_batch
    from hero_tpu.data.store import QueryTokStore
    from hero_tpu.models import violin
    plain, packed = dbs
    qdb = QueryTokStore(corpus["violin_query"])
    qids = [q for q in sorted(qdb.id2len) if q.endswith("_0")][:2]
    cfg = tiny_hero_config()
    params = violin.init_hero_for_violin(jax.random.PRNGKey(5), cfg)

    def vl_batch(db):
        ds = ViolinDataset(qids, db, qdb, stmt_len=16)
        b = build_batch(ds, list(range(len(qids))), flatten_rows=True)
        return {k: jnp.asarray(v) for k, v in b.items()
                if not k.startswith("__")}
    ba, bb = vl_batch(plain), vl_batch(packed)
    la = violin.forward_violin(params, cfg, ba)
    lb = violin.forward_violin(params, cfg, bb)
    np.testing.assert_allclose(float(la), float(lb), rtol=2e-4)
    ga = jax.grad(lambda p: violin.forward_violin(p, cfg, ba))(params)
    gb = jax.grad(lambda p: violin.forward_violin(p, cfg, bb))(params)
    na = jnp.sqrt(sum(jnp.sum(x * x) for x in jax.tree.leaves(ga)))
    diff = jnp.sqrt(sum(jnp.sum((x - y) ** 2) for x, y in
                        zip(jax.tree.leaves(ga), jax.tree.leaves(gb))))
    assert float(diff) <= 2e-3 * max(float(na), 1e-6), (float(diff),
                                                        float(na))


def test_tvc_batch_keeps_packed_keys(dbs, corpus):
    """build_tvc_batch must carry the packed seg/pos keys through to the
    model — dropping them silently runs UNPACKED attention over packed
    rows (cross-sub leakage; forward_repr keys on sub_txt_seg presence,
    models/model.py:190)."""
    from hero_tpu.data.downstream_tasks import (TvcCaptionStore,
                                                TvcTrainDataset,
                                                build_tvc_batch)
    _, packed = dbs
    cap_db = TvcCaptionStore(corpus["cap"])
    ds = TvcTrainDataset(packed, cap_db, caps_per_video=2, cap_len=12,
                         seg_len=16)
    b = build_tvc_batch(ds, [0, 1])
    for k in ("sub_txt_seg", "sub_frame_seg", "sub_txt_pos",
              "sub_frame_pos"):
        assert k in b, k
        assert b[k].shape[:1] == (2,)


def test_suggest_downstream_lens(corpus):
    """Occupancy-driven downstream budgets (qa/stmt/cap/seg/clips) are
    corpus-derived like the pretrain bucket, and each suggested length
    actually holds the coverage quantile of its unit."""
    from hero_tpu.data.downstream_tasks import suggest_downstream_lens
    from hero_tpu.data.store import HeroStore, _load_json

    qa = suggest_downstream_lens("tvqa", corpus["qa_query"], coverage=1.0)
    store = HeroStore(corpus["qa_query"])
    units = []
    for qid in _load_json(corpus["qa_query"], "id2len.json", {}):
        ex = store[qid]
        units.extend(2 + len(ex["input_ids"][0]) + len(a)
                     for a in ex["input_ids"][1:])
    assert qa["bucket_query_len"] >= max(units)
    assert qa["bucket_query_len"] % 8 == 0

    vl = suggest_downstream_lens("violin", corpus["violin_query"],
                                 coverage=1.0)
    vstore = HeroStore(corpus["violin_query"])
    stmts = [1 + len(vstore[q]["input_ids"]) for q in
             _load_json(corpus["violin_query"], "id2len.json", {})]
    assert vl["bucket_query_len"] >= max(stmts)

    tvc = suggest_downstream_lens("tvc", corpus["cap"], coverage=1.0,
                                  frame_interval=1.5,
                                  max_clip_len=MAX_FRAMES)
    assert set(tvc) == {"bucket_cap_len", "bucket_seg_len",
                        "clips_per_item"}
    assert tvc["bucket_seg_len"] >= 1 and tvc["clips_per_item"] >= 1
    # clips_per_item covers the densest video at coverage=1.0
    vid2clips = _load_json(
        __import__("os").path.join(corpus["cap"], "clip.db"),
        "vid2clips.json", {})
    assert tvc["clips_per_item"] >= max(len(c) for c in vid2clips.values())


def test_suggest_packed_shapes_append_len(corpus):
    """QA-style packing: append_len inflates every packed UNIT (each
    segment carries its own QA copy), so the suggested packed bucket at
    append_len=k must hold (sub+k)-sized units with zero drops."""
    from hero_tpu.data.downstream_tasks import VideoQaDataset
    from hero_tpu.data.store import QueryTokStore
    from hero_tpu.data.video import suggest_packed_shapes
    sub = SubTokStore(corpus["sub"], max_clip_len=MAX_FRAMES)
    vfeat = VideoFeatStore(corpus["vfeat"], max_clip_len=MAX_FRAMES)
    qdb = QueryTokStore(corpus["qa_query"])
    k = 16
    sp = suggest_packed_shapes(sub, coverage=1.0, max_txt_len=8,
                               base=UNPACKED.replace(n_frames=MAX_FRAMES),
                               append_len=k)
    db = VideoFeatSubTokDataset(sub, vfeat, sp, max_txt_len=8, pack=True)
    ds = VideoQaDataset(sorted(qdb.id2len)[:3], db, qdb, qa_len=k)
    for i in range(len(ds)):
        ds[i]
    rep = db.truncation_report()
    assert rep["subs_dropped"] == 0 and rep["txt_tokens_dropped"] == 0, rep


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
