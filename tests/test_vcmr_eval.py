"""End-to-end full-corpus VCMR eval on synthetic data (tiny model, CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hero_tpu.config.model_config import tiny_hero_config
from hero_tpu.data import synthetic
from hero_tpu.evaluation import tvr_metrics
from hero_tpu.evaluation.vcmr_eval import (VcmrEvalOpts,
                                           validate_full_vcmr)
from hero_tpu.models import pretrain


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_hero_config()
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(0), cfg)
    vsm = pretrain.VsmConfig(lw_neg_ctx=1.0, lw_neg_q=1.0, lw_st_ed=0.01)
    return cfg, params, vsm


def _video_batches(shape, n_batches=2):
    for i in range(n_batches):
        yield synthetic.base_batch(shape, seed=10 + i)


def test_full_vcmr_eval_pipeline(setup, tmp_path):
    cfg, params, vsm = setup
    shape = dataclasses.replace(synthetic.TINY, batch=3)
    n_videos = 6
    video_ids = [f"vid{i}" for i in range(n_videos)]
    video2idx = {v: 100 + i for i, v in enumerate(video_ids)}

    n_q = 5
    r = np.random.RandomState(0)
    gt_vids = [video_ids[r.randint(n_videos)] for _ in range(n_q)]
    ts = []
    interval = 1.5
    for q in range(n_q):
        st = r.randint(0, shape.n_frames // 2)
        ts.append([st * interval, (st + r.randint(2, 6)) * interval])
    query_data = {q: {"desc_id": q, "desc": "", "vid_name": gt_vids[q],
                      "ts": ts[q], "type": "vt"} for q in range(n_q)}
    query_batches = [{
        "qids": list(range(n_q)),
        "vids": gt_vids,
        "query_input_ids": r.randint(3, 128, (n_q, 6)).astype(np.int32),
        "query_attn_masks": np.ones((n_q, 6), np.float32),
    }]

    opts = VcmrEvalOpts(max_vcmr_video=6, min_pred_l=2, max_pred_l=8,
                        max_before_nms=50, max_after_nms=20, nms_thd=0.5,
                        vfeat_interval=interval,
                        max_clip_len=shape.n_frames)
    val_log, submission, metrics = validate_full_vcmr(
        params, cfg, vsm, opts, _video_batches(shape), query_batches,
        video_ids, video2idx, query_data, dtype=jnp.float32)

    # schema
    assert set(submission) == {"video2idx", "SVMR", "VCMR", "VR"}
    for task in ("SVMR", "VCMR", "VR"):
        assert len(submission[task]) == n_q
        for e in submission[task]:
            assert set(e) == {"desc_id", "desc", "predictions"}
            assert len(e["predictions"]) <= opts.max_after_nms
            for p in e["predictions"]:
                assert len(p) == 4
    # every VR list covers distinct videos, top-`n_videos`
    vr0 = submission["VR"][0]["predictions"]
    assert len({p[0] for p in vr0}) == len(vr0) == n_videos

    # an untrained model must still produce valid (finite, sorted) scores
    scores = [p[3] for p in submission["VCMR"][0]["predictions"]]
    assert all(np.isfinite(scores))
    assert scores == sorted(scores, reverse=True)

    # metrics exist for all tasks incl. nms'd variants in val_log
    assert metrics is not None and "VCMR" in metrics and "VR" in metrics
    assert any("nms" in k for k in val_log)
    # R@100 ≥ R@1 monotonicity
    m = metrics["VCMR"]
    assert m["0.5-r100"] >= m["0.5-r1"]

    # submission is valid for the reference-protocol standalone evaluator
    ours = tvr_metrics.eval_retrieval(
        submission, list(query_data.values()), match_number=True)
    assert ours["VR"]["r100"] == 100.0  # 6 videos, all retrieved in top-100


def test_span_decode_seconds(setup):
    """VCMR st/ed decode: st = idx*interval, ed = (idx+1)*interval."""
    cfg, params, vsm = setup
    shape = dataclasses.replace(synthetic.TINY, batch=2)
    video_ids = ["a", "b"]
    video2idx = {"a": 0, "b": 1}
    r = np.random.RandomState(1)
    qb = [{"qids": [0], "vids": ["a"],
           "query_input_ids": r.randint(3, 128, (1, 6)).astype(np.int32),
           "query_attn_masks": np.ones((1, 6), np.float32)}]
    qd = {0: {"desc_id": 0, "desc": "", "vid_name": "a",
              "ts": [0.0, 3.0], "type": "v"}}
    opts = VcmrEvalOpts(max_vcmr_video=2, min_pred_l=1, max_pred_l=8,
                        max_before_nms=10, max_after_nms=5, nms_thd=-1,
                        vfeat_interval=2.0, max_clip_len=shape.n_frames)
    _, submission, _ = validate_full_vcmr(
        params, cfg, vsm, opts,
        [synthetic.base_batch(shape, seed=5)], qb, video_ids, video2idx,
        qd, dtype=jnp.float32)
    for p in submission["VCMR"][0]["predictions"]:
        st, ed = p[1], p[2]
        assert st % 2.0 == 0.0
        assert ed % 2.0 == 0.0 and ed > st
        # length band respected: 1 <= (ed-st)/interval - ... span geq 1 frame
        assert (ed - st) / 2.0 >= 1


def test_sharded_corpus_eval_matches_unsharded(setup):
    """Serve-path corpus sharding: with the corpus split over the 8-device
    mesh (videos padded to a device multiple with zero-mask rows), the
    full VCMR eval produces the IDENTICAL submission and metrics as the
    unsharded run (SURVEY §7: shard the corpus over devices)."""
    from hero_tpu.parallel.mesh import get_mesh
    cfg, params, vsm = setup
    shape = dataclasses.replace(synthetic.TINY, batch=3)
    n_videos = 6   # pads to 8 on the 8-device mesh
    video_ids = [f"v{i}" for i in range(n_videos)]
    video2idx = {v: i for i, v in enumerate(video_ids)}
    r = np.random.RandomState(3)
    n_q = 4
    gt = [video_ids[r.randint(n_videos)] for _ in range(n_q)]
    qd = {q: {"desc_id": q, "desc": "", "vid_name": gt[q],
              "ts": [0.0, 4.5], "type": "v"} for q in range(n_q)}
    qb = [{"qids": list(range(n_q)), "vids": gt,
           "query_input_ids": r.randint(3, 128, (n_q, 6)).astype(np.int32),
           "query_attn_masks": np.ones((n_q, 6), np.float32)}]
    opts = VcmrEvalOpts(max_vcmr_video=6, min_pred_l=1, max_pred_l=8,
                        max_before_nms=20, max_after_nms=10, nms_thd=-1,
                        vfeat_interval=1.5, max_clip_len=shape.n_frames)

    def batches():
        return [synthetic.base_batch(shape, seed=10),
                synthetic.base_batch(shape, seed=11)]

    _, sub_ref, m_ref = validate_full_vcmr(
        params, cfg, vsm, opts, batches(), [dict(b) for b in qb],
        video_ids, video2idx, qd, dtype=jnp.float32)
    mesh = get_mesh()
    assert mesh.devices.size == 8
    _, sub_sh, m_sh = validate_full_vcmr(
        params, cfg, vsm, opts, batches(), [dict(b) for b in qb],
        video_ids, video2idx, qd, dtype=jnp.float32, mesh=mesh)
    assert m_ref == m_sh
    for task in ("VCMR", "VR"):
        for a, b in zip(sub_ref[task], sub_sh[task]):
            assert a["desc_id"] == b["desc_id"]
            for pa, pb in zip(a["predictions"], b["predictions"]):
                assert pa[:3] == pb[:3]
                assert pa[3] == pytest.approx(pb[3], rel=1e-5)

    # packed queries × sharded corpus: the (Nq, D) pooled matrix feeds
    # the mesh-sharded scorer — same metrics again
    opts_p = dataclasses.replace(opts, pack_queries=True,
                                 query_pack_segs=3,
                                 query_pack_rows_per_call=2)
    _, sub_sp, m_sp = validate_full_vcmr(
        params, cfg, vsm, opts_p, batches(), [dict(b) for b in qb],
        video_ids, video2idx, qd, dtype=jnp.float32, mesh=mesh)
    assert m_ref == m_sp
    for task in ("VCMR", "VR"):
        for a, b in zip(sub_ref[task], sub_sp[task]):
            assert a["desc_id"] == b["desc_id"]
            for pa, pb in zip(a["predictions"], b["predictions"]):
                assert pa[:3] == pb[:3]
                assert pa[3] == pytest.approx(pb[3], rel=1e-4)


def test_padded_tail_batches_match_unpadded(setup):
    """VERDICT r3 #6 (one-compile eval): query tail batches padded to the
    fixed batch size with zero-masked rows — and video tail batches padded
    with zero-mask dummy videos — produce the IDENTICAL submission and
    metrics as the ragged run; only the compile count changes."""
    cfg, params, vsm = setup
    shape = dataclasses.replace(synthetic.TINY, batch=3)
    n_videos = 6
    video_ids = [f"v{i}" for i in range(n_videos)]
    video2idx = {v: i for i, v in enumerate(video_ids)}
    r = np.random.RandomState(9)
    n_q = 5
    gt = [video_ids[r.randint(n_videos)] for _ in range(n_q)]
    qd = {q: {"desc_id": q, "desc": "", "vid_name": gt[q],
              "ts": [0.0, 4.5], "type": "v"} for q in range(n_q)}
    q_ids = r.randint(3, 128, (n_q, 6)).astype(np.int32)
    q_masks = np.ones((n_q, 6), np.float32)
    opts = VcmrEvalOpts(max_vcmr_video=6, min_pred_l=1, max_pred_l=8,
                        max_before_nms=20, max_after_nms=10, nms_thd=-1,
                        vfeat_interval=1.5, max_clip_len=shape.n_frames)

    # ragged: batches of 3 + 2
    qb_ragged = [
        {"qids": [0, 1, 2], "vids": gt[:3],
         "query_input_ids": q_ids[:3], "query_attn_masks": q_masks[:3]},
        {"qids": [3, 4], "vids": gt[3:],
         "query_input_ids": q_ids[3:], "query_attn_masks": q_masks[3:]},
    ]
    # padded: the tail batch padded to 3 rows with a zero-masked dummy
    pad_ids = np.concatenate([q_ids[3:], np.full((1, 6), 1, np.int32)])
    pad_masks = np.concatenate([q_masks[3:], np.zeros((1, 6), np.float32)])
    qb_padded = [
        dict(qb_ragged[0]),
        {"qids": [3, 4], "vids": gt[3:],
         "query_input_ids": pad_ids, "query_attn_masks": pad_masks},
    ]

    def vb_ragged():
        return [synthetic.base_batch(shape, seed=10),
                synthetic.base_batch(shape, seed=11)]

    def vb_padded():
        a = synthetic.base_batch(shape, seed=10)
        b = synthetic.base_batch(shape, seed=11)
        # drop the 6th video from the corpus list?  no — keep the same 6
        # real videos and APPEND a fully-padded dummy batch entry instead:
        # pad the second batch from 3 to 4 rows with a zero-mask video
        b = {k: np.concatenate([v, np.zeros_like(v[:1])]) for k, v in
             b.items()}
        return [a, b]

    val_ref, sub_ref, m_ref = validate_full_vcmr(
        params, cfg, vsm, opts, vb_ragged(), qb_ragged,
        video_ids, video2idx, qd, dtype=jnp.float32)
    val_pad, sub_pad, m_pad = validate_full_vcmr(
        params, cfg, vsm, opts, vb_padded(), qb_padded,
        video_ids, video2idx, qd, dtype=jnp.float32)
    assert m_ref == m_pad
    assert val_ref == val_pad
    for task in ("VCMR", "SVMR", "VR"):
        assert len(sub_ref[task]) == len(sub_pad[task]) == n_q
        for a, b in zip(sub_ref[task], sub_pad[task]):
            assert a["desc_id"] == b["desc_id"]
            for pa, pb in zip(a["predictions"], b["predictions"]):
                assert pa[:3] == pb[:3]
                # raw scores: the padded batch (4 rows vs 3) changes
                # XLA's fp32 matmul tiling, so reduction order inside
                # each real row's dot products shifts by ~1e-6 rel —
                # rankings/metrics above are asserted exactly
                assert pa[3] == pytest.approx(pb[3], rel=2e-5)


def test_chunked_corpus_eval_bit_equal(setup):
    """VERDICT r3 #5: a corpus 4x over the chunk budget, scored chunk by
    chunk with the exact k-way top-k merge, matches the resident path
    BIT-FOR-BIT (submissions and metrics)."""
    cfg, params, vsm = setup
    shape = dataclasses.replace(synthetic.TINY, batch=3)
    n_videos = 12                     # 4 chunks of 3
    video_ids = [f"v{i}" for i in range(n_videos)]
    video2idx = {v: i for i, v in enumerate(video_ids)}
    r = np.random.RandomState(21)
    n_q = 5
    gt = [video_ids[r.randint(n_videos)] for _ in range(n_q)]
    qd = {q: {"desc_id": q, "desc": "", "vid_name": gt[q],
              "ts": [0.0, 4.5], "type": "v"} for q in range(n_q)}
    qb = [{"qids": [0, 1, 2], "vids": gt[:3],
           "query_input_ids": r.randint(3, 128, (3, 6)).astype(np.int32),
           "query_attn_masks": np.ones((3, 6), np.float32)},
          {"qids": [3, 4], "vids": gt[3:],
           "query_input_ids": r.randint(3, 128, (2, 6)).astype(np.int32),
           "query_attn_masks": np.ones((2, 6), np.float32)}]

    def batches():
        return [synthetic.base_batch(shape, seed=30 + i) for i in range(4)]

    base = VcmrEvalOpts(max_vcmr_video=7, min_pred_l=1, max_pred_l=8,
                        max_before_nms=25, max_after_nms=10, nms_thd=0.5,
                        vfeat_interval=1.5, max_clip_len=shape.n_frames)
    val_r, sub_r, m_r = validate_full_vcmr(
        params, cfg, vsm, base, batches(), [dict(b) for b in qb],
        video_ids, video2idx, qd, dtype=jnp.float32)
    chunked = dataclasses.replace(base, corpus_chunk_videos=3)
    val_c, sub_c, m_c = validate_full_vcmr(
        params, cfg, vsm, chunked, batches(), [dict(b) for b in qb],
        video_ids, video2idx, qd, dtype=jnp.float32)
    assert m_r == m_c
    assert val_r == val_c
    assert sub_r == sub_c          # bit-for-bit incl. float scores


def test_full_eval_dataset_pads_tail_batch(tmp_path):
    """VcmrFullEvalDataset.batches(pad_to_full=True) emits fixed-shape
    arrays with real-length qids/vids."""
    from hero_tpu.data.downstream_tasks import VcmrFullEvalDataset
    from hero_tpu.data.store import HeroStoreWriter, QueryTokStore
    from hero_tpu.data.video import FixedShapes
    import json, os
    db = str(tmp_path / "query_db")
    with HeroStoreWriter(db) as w:
        for q in range(5):
            w.put(f"q{q}", {"input_ids": [3, 4, 5]})
    json.dump({f"q{q}": 3 for q in range(5)},
              open(os.path.join(db, "id2len.json"), "w"))
    json.dump({f"q{q}": "vidA" for q in range(5)},
              open(os.path.join(db, "query2video.json"), "w"))
    json.dump({"CLS": 0, "SEP": 2, "PAD": 1, "MASK": 50264,
               "v_range": [3, 128]},
              open(os.path.join(db, "meta.json"), "w"))
    qdb = QueryTokStore(db)
    ds = VcmrFullEvalDataset(list(qdb.id2len.keys()), qdb,
                             FixedShapes(query_len=8))
    batches = list(ds.batches(3, pad_to_full=True))
    assert len(batches) == 2
    assert batches[1]["query_input_ids"].shape == (3, 8)
    assert len(batches[1]["qids"]) == 2
    # pad row: pad token everywhere, zero mask
    assert (batches[1]["query_input_ids"][2] == qdb.pad).all()
    assert (batches[1]["query_attn_masks"][2] == 0).all()
    # ragged mode unchanged
    ragged = list(ds.batches(3, pad_to_full=False))
    assert ragged[1]["query_input_ids"].shape == (2, 8)


def test_scorer_matches_dense_reference(setup):
    """Band-gather scorer with softmax-after-top-k == the reference-style
    dense path (full softmax over all videos, dense (L, L) span cube,
    global sort — reference eval_vcmr.py:237-323)."""
    from hero_tpu.evaluation.vcmr_eval import (embed_video_corpus,
                                               make_query_scorer)
    from hero_tpu.models import vcmr as vcmr_lib

    cfg, params, vsm = setup
    shape = dataclasses.replace(synthetic.TINY, batch=3)
    opts = VcmrEvalOpts(max_vcmr_video=4, min_pred_l=1, max_pred_l=4,
                        max_before_nms=12, vfeat_interval=1.5,
                        max_clip_len=shape.n_frames)
    frame_embs, frame_masks = embed_video_corpus(
        params, cfg, _video_batches(shape, 2), shape.n_frames,
        dtype=jnp.float32)
    nv = int(frame_embs.shape[0])
    L = int(frame_embs.shape[1])
    r = np.random.RandomState(7)
    nq = 5
    q_ids = jnp.asarray(r.randint(3, 128, (nq, 6)).astype(np.int32))
    q_mask = jnp.ones((nq, 6), np.float32)
    gt_vidx = jnp.asarray(r.randint(0, nv, (nq,)).astype(np.int32))

    scorer, max_v = make_query_scorer(params, cfg, vsm, opts, frame_embs,
                                      frame_masks, jnp.float32)
    st_gt, ed_gt, tsc, tidx, fsc, fidx = map(
        np.asarray, scorer(q_ids, q_mask, gt_vidx))

    # dense path
    scores, st, ed = vcmr_lib.get_pred_from_raw_query(
        params, cfg, vsm, frame_embs, frame_masks, q_ids, q_mask,
        cross=True, dtype=jnp.float32)
    st_p = np.asarray(jax.nn.softmax(st.astype(jnp.float32), -1))
    ed_p = np.asarray(jax.nn.softmax(ed.astype(jnp.float32), -1))
    sharp = np.exp(opts.q2c_alpha * np.asarray(scores, np.float32))

    # GT-row probabilities match the full-softmax rows exactly
    rows = np.arange(nq)
    np.testing.assert_allclose(st_gt, st_p[rows, np.asarray(gt_vidx)],
                               rtol=1e-6)
    np.testing.assert_allclose(ed_gt, ed_p[rows, np.asarray(gt_vidx)],
                               rtol=1e-6)

    band = tvr_metrics.generate_min_max_length_mask(
        (1, 1, L, L), opts.min_pred_l, opts.max_pred_l)[0, 0]
    for qi in range(nq):
        order = np.argsort(-sharp[qi])[:max_v]
        assert set(np.asarray(tidx)[qi]) == set(order)
        # dense cube over the selected videos, every (st, ed) position
        dense = {}
        for rank, vi in enumerate(np.asarray(tidx)[qi]):
            cube = np.outer(st_p[qi, vi], ed_p[qi, vi]) * sharp[qi, vi]
            cube = cube * band
            for flat in np.argsort(-cube.reshape(-1))[:opts.max_before_nms]:
                dense[rank * L * L + flat] = cube.reshape(-1)[flat]
        want = sorted(dense.values(), reverse=True)[:opts.max_before_nms]
        np.testing.assert_allclose(fsc[qi], want, rtol=1e-5)
        # flat indices decode to the same (video, st, ed) triples
        got = {int(i): float(s) for i, s in zip(fidx[qi], fsc[qi])}
        for flat_i, s in got.items():
            assert flat_i in dense
            np.testing.assert_allclose(s, dense[flat_i], rtol=1e-5)


def test_pack_queries_placement():
    """Every query lands exactly once, within its row's budget, ≤max_segs
    per row, no slot overlap; over-long queries fail loudly."""
    from hero_tpu.data.packing import pack_queries
    lens = [15, 8, 30, 2, 14, 16, 1, 29, 30, 5]
    pls, n_rows = pack_queries(lens, row_len=30, max_segs=3)
    assert len(pls) == len(lens)
    used = {}
    for qi, pl in enumerate(pls):
        assert pl.tlen == lens[qi]
        assert 0 <= pl.toff and pl.toff + pl.tlen <= 30
        for slot in range(pl.toff, pl.toff + pl.tlen):
            key = (pl.row, slot)
            assert key not in used, f"slot overlap at {key}"
            used[key] = qi
    rows = {}
    for pl in pls:
        rows.setdefault(pl.row, []).append(pl.seg)
    assert max(pl.row for pl in pls) == n_rows - 1
    for segs in rows.values():
        assert len(segs) <= 3
        assert sorted(segs) == list(range(len(segs)))
    # packs tighter than one row per query
    assert n_rows < len(lens)
    # deterministic
    pls2, n2 = pack_queries(lens, row_len=30, max_segs=3)
    assert n2 == n_rows and pls2 == pls
    with pytest.raises(ValueError):
        pack_queries([31], row_len=30)


def test_encode_queries_packed_equivalence(setup):
    """Packed query encoding (phase 2a) matches per-row encode_query for
    every query, across multiple fixed row-batches + the gather-back."""
    from hero_tpu.evaluation.vcmr_eval import encode_queries_packed
    cfg, params, vsm = setup
    r = np.random.RandomState(11)
    nq, Lq = 9, 6
    lens = r.randint(2, Lq + 1, (nq,))
    q_ids = r.randint(3, 128, (nq, Lq)).astype(np.int32)
    q_mask = np.zeros((nq, Lq), np.float32)
    for i, ln in enumerate(lens):
        q_ids[i, ln:] = 1                      # pad ids (masked anyway)
        q_mask[i, :ln] = 1.0
    ref = np.asarray(pretrain.encode_query(
        params, cfg, jnp.asarray(q_ids), jnp.asarray(q_mask),
        dtype=jnp.float32))
    packed = np.asarray(encode_queries_packed(
        params, cfg, q_ids, lens, max_segs=3, rows_per_call=2,
        dtype=jnp.float32))
    assert packed.shape == ref.shape
    np.testing.assert_allclose(packed, ref, rtol=2e-5, atol=2e-5)


def test_full_vcmr_pack_queries_matches_unpacked(setup):
    """validate_full_vcmr with opts.pack_queries must produce the same
    submission and metrics as the per-row query path (exactness: only the
    encoder layout changes — data/packing.py pack_queries)."""
    cfg, params, vsm = setup
    shape = dataclasses.replace(synthetic.TINY, batch=3)
    n_videos = 6
    video_ids = [f"v{i}" for i in range(n_videos)]
    video2idx = {v: i for i, v in enumerate(video_ids)}
    r = np.random.RandomState(5)
    n_q = 6
    gt = [video_ids[r.randint(n_videos)] for _ in range(n_q)]
    qd = {q: {"desc_id": q, "desc": "", "vid_name": gt[q],
              "ts": [0.0, 4.5], "type": "v"} for q in range(n_q)}
    q_ids = r.randint(3, 128, (n_q, 6)).astype(np.int32)
    q_mask = np.zeros((n_q, 6), np.float32)
    for i in range(n_q):
        ln = r.randint(2, 7)
        q_mask[i, :ln] = 1.0
        q_ids[i, ln:] = 1
    qb = [{"qids": list(range(3)), "vids": gt[:3],
           "query_input_ids": q_ids[:3], "query_attn_masks": q_mask[:3]},
          {"qids": list(range(3, 6)), "vids": gt[3:],
           "query_input_ids": q_ids[3:], "query_attn_masks": q_mask[3:]}]
    opts = VcmrEvalOpts(max_vcmr_video=6, min_pred_l=1, max_pred_l=8,
                        max_before_nms=20, max_after_nms=10, nms_thd=-1,
                        vfeat_interval=1.5, max_clip_len=shape.n_frames)

    def batches():
        return [synthetic.base_batch(shape, seed=10),
                synthetic.base_batch(shape, seed=11)]

    _, sub_ref, m_ref = validate_full_vcmr(
        params, cfg, vsm, opts, batches(), [dict(b) for b in qb],
        video_ids, video2idx, qd, dtype=jnp.float32)
    opts_p = dataclasses.replace(opts, pack_queries=True,
                                 query_pack_segs=3,
                                 query_pack_rows_per_call=2)
    _, sub_p, m_p = validate_full_vcmr(
        params, cfg, vsm, opts_p, batches(), [dict(b) for b in qb],
        video_ids, video2idx, qd, dtype=jnp.float32)
    assert m_ref == m_p
    for task in ("VCMR", "VR", "SVMR"):
        for a, b in zip(sub_ref[task], sub_p[task]):
            assert a["desc_id"] == b["desc_id"]
            for pa, pb in zip(a["predictions"], b["predictions"]):
                assert pa[:3] == pb[:3]
                assert pa[3] == pytest.approx(pb[3], rel=1e-4)


def test_fused_packed_scorer_matches_raw(setup):
    """The single-dispatch serving program (packed encode + score + top-k
    in one jit) returns the same outputs as the per-batch raw-ids scorer
    for every query."""
    from hero_tpu.evaluation.vcmr_eval import (embed_video_corpus,
                                               make_fused_packed_scorer,
                                               make_query_scorer,
                                               pack_query_arrays)
    cfg, params, vsm = setup
    shape = dataclasses.replace(synthetic.TINY, batch=3)
    opts = VcmrEvalOpts(max_vcmr_video=4, min_pred_l=1, max_pred_l=4,
                        max_before_nms=12, vfeat_interval=1.5,
                        max_clip_len=shape.n_frames)
    frame_embs, frame_masks = embed_video_corpus(
        params, cfg, _video_batches(shape, 2), shape.n_frames,
        dtype=jnp.float32)
    r = np.random.RandomState(13)
    nq, Lq = 8, 6
    lens = r.randint(2, Lq + 1, (nq,))
    q_ids = r.randint(3, 128, (nq, Lq)).astype(np.int32)
    q_mask = np.zeros((nq, Lq), np.float32)
    for i, ln in enumerate(lens):
        q_ids[i, ln:] = 1
        q_mask[i, :ln] = 1.0
    gt = r.randint(0, int(frame_embs.shape[0]), (nq,)).astype(np.int32)

    scorer, _ = make_query_scorer(params, cfg, vsm, opts, frame_embs,
                                  frame_masks, jnp.float32)
    ref = scorer(jnp.asarray(q_ids), jnp.asarray(q_mask), jnp.asarray(gt))

    fused, _ = make_fused_packed_scorer(params, cfg, vsm, opts, frame_embs,
                                        frame_masks, jnp.float32,
                                        max_segs=3)
    arrs = pack_query_arrays(q_ids, lens, max_segs=3, rows_per_call=2)
    got = fused(*(jnp.asarray(a) for a in arrs), jnp.asarray(gt))

    for name, a, b in zip(("st_gt", "ed_gt", "tsc", "tidx", "sc2", "fidx"),
                          ref, got):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind in "iu":
            np.testing.assert_array_equal(a, b, err_msg=name)
        else:
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6,
                                       err_msg=name)


def test_ranker_exact_vs_numpy_with_ties():
    """The chunked exact top-k in _make_ranker == a brute-force numpy
    reference (value desc, flat (video, st·L+ed) asc — lax.top_k tie
    semantics), on tie-heavy quantized inputs and with corpus pad rows.

    Guards the round-5 chunk-max selection theorem: under the total
    order (value desc, position asc), the top-k elements occupy <= k
    chunks and each such chunk ranks at or above the k-th chunk, so
    gathering the top-k chunks is lossless — ties included."""
    from hero_tpu.evaluation.vcmr_eval import _make_ranker

    L, n_videos, n_rows, nq = 16, 20, 24, 5
    opts = VcmrEvalOpts(max_vcmr_video=10, min_pred_l=2, max_pred_l=6,
                        max_before_nms=60, vfeat_interval=1.5,
                        max_clip_len=L)
    r = np.random.RandomState(3)
    # quantized logits force many exact ties in the span products; the
    # ranker convs selected rows itself — scalar st/ed kernels (1x and
    # 2x) keep the numpy reference exact while st != ed
    sim = np.round(r.randn(nq, n_rows, L) * 2) / 2
    scores = np.round(r.randn(nq, n_rows) * 4) / 8
    scores[:, n_videos:] = 10.0  # pad rows must never be selected
    gt = r.randint(0, n_videos, (nq,)).astype(np.int32)
    fmask = np.ones((n_rows, L), np.float32)
    fmask[:, L - 3:] = 0.0       # masked tail frames
    head = {"video_st_predictor": {"kernel": jnp.ones((1,), jnp.float32)},
            "video_ed_predictor": {"kernel": jnp.full((1,), 2.0,
                                                      jnp.float32)}}

    rank, max_v = _make_ranker(opts, n_videos, n_rows, L)
    st_gt, ed_gt, tsc, tidx, sc2, fidx = map(np.asarray, jax.jit(rank)(
        jnp.asarray(sim, jnp.float32), jnp.asarray(scores, jnp.float32),
        jnp.asarray(gt), head, jnp.asarray(fmask)))

    band = tvr_metrics.generate_min_max_length_mask(
        (1, 1, L, L), opts.min_pred_l, opts.max_pred_l)[0, 0]
    band_flat = band.reshape(-1).astype(bool)
    # XLA's exp differs from np.exp by 1 ulp on some inputs, which would
    # split tie groups between the two references — use the same op
    sharp = np.array(jnp.exp(
        opts.q2c_alpha * jnp.asarray(scores, jnp.float32)))
    sharp[:, n_videos:] = -1.0
    st_l = sim.astype(np.float32) * 1.0 + (1.0 - fmask[None]) * -1e4
    ed_l = sim.astype(np.float32) * 2.0 + (1.0 - fmask[None]) * -1e4
    st_p = np.asarray(jax.nn.softmax(jnp.asarray(st_l, jnp.float32), -1))
    ed_p = np.asarray(jax.nn.softmax(jnp.asarray(ed_l, jnp.float32), -1))
    k = opts.max_before_nms
    for qi in range(nq):
        order = np.argsort(-sharp[qi], kind="stable")[:max_v]
        np.testing.assert_array_equal(tidx[qi], order)
        cands = []  # (negval, flat_selected_rank_idx, value)
        for rank_i, vi in enumerate(order):
            cube = (np.outer(st_p[qi, vi], ed_p[qi, vi])
                    * sharp[qi, vi]).reshape(-1)
            for flat in np.flatnonzero(band_flat):
                cands.append((-cube[flat], rank_i * L * L + flat,
                              cube[flat]))
        cands.sort()
        want_v = np.array([c[2] for c in cands[:k]], np.float32)
        want_i = np.array([c[1] for c in cands[:k]], np.int64)
        np.testing.assert_allclose(sc2[qi], want_v, rtol=1e-6)
        np.testing.assert_array_equal(fidx[qi], want_i)
