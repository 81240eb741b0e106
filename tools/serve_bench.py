"""Serve-path benchmark: two-phase VCMR corpus eval throughput on one chip.

Phase 1 embeds a synthetic 2000-video x 100-frame corpus; phase 2 scores
query batches against it through the fused scorer (softmax spans, exp
sharpening, top-k videos, span cube + band mask, chunked exact top-k).
Reports phase-1 videos/s and phase-2 queries/s (the serving number),
prints ONE JSON line, and writes BENCH_SERVE.json at the repo root.

``vs_baseline`` compares phase-2 queries/s against an analytic V100
model of the REFERENCE's phase-2 (``eval_vcmr.py:209-323`` — the same
einsum/conv/softmax math, then its cube + sort ranking):

- compute: per query ≈ 4·Nv·L·D FLOPs (st/ed similarity einsum
  "md,nld->mnl" + video-level scores einsum, ``model/pretrain.py:146-153,
  405-413``) + the query encoder; V100 sustaining the same 30% of its
  125 TFLOP/s fp16 peak that bench.py assumes.
- memory: the corpus tensor (Nv,L,D) fp16 is streamed twice per batch,
  ~8 full passes over the (Nq,Nv,L) intermediates (conv in/out, masked
  softmax st/ed, exp sharpening); the fp32 (Nq,max_v,L,L) span cube is
  written by the einsum (``eval_vcmr.py:289-291``) then read+written
  again by the broadcast band-mask multiply (``:292-297``); V100
  sustaining 60% of 900 GB/s.
- sort: ``torch.sort`` over the flattened (Nq, max_v·L·L) cube
  (``eval_vcmr.py:298-304``) — max_v·L² = 1e6 fp32 keys PER QUERY with
  int64 index payload.  Modeled at 2e9 elements/s, the upper end of
  published cub/thrust segmented-sort throughput on V100; this is the
  reference's dominant phase-2 cost and the term the TPU path avoids
  entirely (band-gather + chunked exact top-k needs no dense cube and
  no full sort).
- time/batch = max(compute, memory) + sort.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hero_tpu.data import synthetic
from hero_tpu.evaluation.vcmr_eval import (VcmrEvalOpts,
                                           embed_video_corpus,
                                           make_query_scorer)
from hero_tpu.models import pretrain
from hero_tpu.utils.misc import enable_fast_rng
import bench


def v100_phase1_videos_per_sec(shape, cfg):
    """Analytic V100 roofline of the reference phase-1 (eval_vcmr.py:165-203):
    the same backbone forward, fp16, batch 50, H2D overlapped on a side
    CUDA stream (PrefetchLoader) so compute-bound."""
    import bench
    fwd_per_video = bench.analytic_train_flops_per_example(shape, cfg) / 3.0
    # drop the query-encoder term (phase 1 embeds videos only)
    D = cfg.f_config.hidden_size
    q = bench.transformer_flops(1, shape.query_len, D, 3072, shape.n_queries)
    return 0.30 * 125e12 / (fwd_per_video - q)


def v100_phase2_queries_per_sec(n_videos, query_bs, L=100, D=768,
                                max_v=100, q_len=30):
    """Analytic V100 roofline of the reference phase-2 (see module doc)."""
    flops = query_bs * (4 * n_videos * L * D            # 2 einsums
                        + 2 * (4 * q_len * D * D + 2 * q_len ** 2 * D))
    corpus_bytes = 2 * (n_videos * L * D * 2)           # streamed twice
    inter_bytes = 8 * (query_bs * n_videos * L * 2)     # fp16 passes
    # fp32 cube: einsum write, then band-mask multiply read + write
    # (eval_vcmr.py:289-297)
    cube_bytes = 3 * (query_bs * max_v * L * L * 4)
    t_compute = flops / (0.30 * 125e12)
    t_memory = (corpus_bytes + inter_bytes + cube_bytes) / (0.60 * 900e9)
    # torch.sort over (Nq, max_v*L*L) fp32 keys + int64 indices
    # (eval_vcmr.py:298-304); 2e9 el/s ≈ upper-end V100 radix-sort rate
    t_sort = (query_bs * max_v * L * L) / 2e9
    return query_bs / (max(t_compute, t_memory) + t_sort)


def main(n_videos=2000, video_bs=50, n_queries=512, query_bs=64,
         write_artifact=True):
    enable_fast_rng()
    cfg = bench.flagship_config()
    vsm = pretrain.VsmConfig(lw_neg_ctx=8.0, lw_neg_q=8.0, lw_st_ed=0.01)
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(0), cfg)
    shape = synthetic.BatchShape(batch=video_bs, n_subs=16, txt_len=40,
                                 frames_per_sub=16, n_frames=100,
                                 n_queries=1, query_len=30)
    opts = VcmrEvalOpts(max_vcmr_video=100, min_pred_l=2, max_pred_l=16,
                        max_before_nms=200, vfeat_interval=1.5,
                        max_clip_len=100)

    def video_batches(n):
        b = synthetic.base_batch(shape, seed=1)
        for _ in range(n // video_bs):
            yield b

    # warm up the phase-1 compile before timing (flagship encode compiles
    # for minutes through the tunnel)
    e, m = embed_video_corpus(params, cfg, video_batches(video_bs),
                              opts.max_clip_len, jnp.bfloat16)
    float(jnp.sum(m))
    # phase-1 throughput is measured with a device-resident batch: the
    # reference overlaps H2D on a side CUDA stream (PrefetchLoader,
    # data/loader.py:89-144) so its phase 1 is compute-bound too, and the
    # axon tunnel's ~50 MB/s upload path (87 MB/batch → ~1.8 s) is a
    # harness artifact a real TPU host (PCIe DMA) doesn't have.  The
    # upload cost is measured separately below and reported alongside.
    import bench as bench_mod
    from hero_tpu.models import vcmr as vcmr_lib
    params_dev = jax.device_put(params)
    b_host = synthetic.base_batch(shape, seed=1)
    jb = {k: jax.device_put(jnp.asarray(v)) for k, v in b_host.items()}
    encode = jax.jit(lambda p, bb: vcmr_lib.encode_video_corpus(
        p, cfg, bb, dtype=jnp.bfloat16))
    float(jnp.sum(encode(params_dev, jb)[0, 0]))   # compile
    n_rep = max(1, n_videos // video_bs)

    def median_time(fn, sync, n_runs=3):
        """Median-of-N wall time for one timed loop (VERDICT r4 weak #3:
        the tunnel swings ±15%; every artifact records runs + median)."""
        ts = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            sync(fn())
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2], ts

    def embed_loop(jbx):
        for _ in range(n_rep):
            e = encode(params_dev, jbx)
        return e

    t_embed, embed_runs = median_time(
        lambda: embed_loop(jb), lambda e: float(jnp.sum(e[0, 0])))
    t0 = time.perf_counter()
    jb2 = {k: jax.device_put(np.asarray(v)) for k, v in b_host.items()}
    float(jnp.sum(jb2["c_v_feats"][0, 0, :8]))
    t_upload = time.perf_counter() - t0

    # phase 1 in the production --pack_subs layout (round 4): same
    # TV-distribution content, several subs per f-encoder row — measures
    # the corpus-INDEXING side of the packing claw-back
    from hero_tpu.data.occupancy import sample_tv_video
    rp = np.random.RandomState(3)
    import dataclasses as _dc
    p_shape = _dc.replace(synthetic.TV_PACKED, batch=video_bs, n_queries=1)
    p_batch, _ = synthetic.tv_vsm_batch(
        [sample_tv_video(rp) for _ in range(video_bs)], p_shape,
        packed=True, seed=3)
    jbp = {k: jax.device_put(jnp.asarray(v)) for k, v in p_batch.items()
           if k.startswith(("sub_", "c_"))}
    float(jnp.sum(encode(params_dev, jbp)[0, 0]))   # compile
    t_embed_packed, embed_packed_runs = median_time(
        lambda: embed_loop(jbp), lambda e: float(jnp.sum(e[0, 0])))

    frame_embs, frame_masks = embed_video_corpus(
        params, cfg, video_batches(n_videos), opts.max_clip_len,
        jnp.bfloat16)
    float(jnp.sum(frame_masks))

    # phase-2 queries: realistic TVR description lengths (~13-14 words ≈
    # 15 BPE tokens, TVR paper table 2) in the 30-slot bucket — what the
    # production eval actually sees.  The unpacked path's FLOPs are
    # shape-fixed (mask-independent), so its number is length-independent;
    # the packed path is where realistic lengths matter.
    r = np.random.RandomState(0)
    q_len_bucket = 30
    all_lens = np.clip(np.round(r.normal(15.0, 4.0, n_queries)), 5,
                       q_len_bucket).astype(np.int64)
    all_q_ids = r.randint(3, 50265, (n_queries, q_len_bucket)).astype(
        np.int32)
    all_q_masks = (np.arange(q_len_bucket)[None, :]
                   < all_lens[:, None]).astype(np.float32)

    # (a) unpacked: one padded row per query — the reference's layout
    # (eval_vcmr.py:209-247) and our legacy path
    scorer, max_v = make_query_scorer(params, cfg, vsm, opts, frame_embs,
                                      frame_masks, jnp.bfloat16)
    q_ids = jnp.asarray(all_q_ids[:query_bs])
    q_mask = jnp.asarray(all_q_masks[:query_bs])
    out = scorer(q_ids, q_mask)        # compile
    float(jnp.sum(out[4]))

    def score_loop():
        for _ in range(n_queries // query_bs):
            out = scorer(q_ids, q_mask)
        return out

    t_score, score_runs = median_time(
        score_loop, lambda o: float(jnp.sum(o[4])), n_runs=5)

    # (b) packed + fused (--pack_queries serving configuration): phase 2a
    # packs ALL queries ~2/row (block-diagonal segment mask, exact) and
    # ONE compiled XLA program runs encode + pooled-vector gather +
    # corpus scoring + exact top-k for the whole query set — a single
    # device launch per request batch (make_fused_packed_scorer).  The
    # timed loop uses DEVICE-RESIDENT packed arrays — same convention as
    # phase 1 (host packing is ~5 ms of numpy and the ~350 KB upload is
    # PCIe-trivial on a real TPU host; both are measured separately
    # because the tunnel's ~MB/s upload path is a harness artifact).
    from hero_tpu.evaluation.vcmr_eval import (make_fused_packed_scorer,
                                               pack_query_arrays)
    fused, _ = make_fused_packed_scorer(params, cfg, vsm, opts, frame_embs,
                                        frame_masks, jnp.bfloat16)
    t0 = time.perf_counter()
    p_ids, p_seg, p_pos, gather = pack_query_arrays(
        all_q_ids, all_lens, max_segs=4, rows_per_call=32)
    t_hostpack = time.perf_counter() - t0
    t0 = time.perf_counter()
    jp = [jax.device_put(jnp.asarray(x))
          for x in (p_ids, p_seg, p_pos, gather)]
    float(jnp.sum(jp[0][0, :8]))
    t_packed_upload = time.perf_counter() - t0

    def packed_loop():
        return fused(*jp)

    float(jnp.sum(packed_loop()[4]))    # compile
    t_score_packed, score_packed_runs = median_time(
        packed_loop, lambda o: float(jnp.sum(o[4])), n_runs=5)

    videos_per_s = n_rep * video_bs / t_embed
    videos_per_s_packed = n_rep * video_bs / t_embed_packed
    queries_per_s = n_queries / t_score
    queries_per_s_packed = n_queries / t_score_packed
    v100_qps = v100_phase2_queries_per_sec(n_videos, query_bs,
                                           max_v=max_v)
    v100_vps = v100_phase1_videos_per_sec(shape, cfg)
    print(f"# phase1: {videos_per_s:.1f} videos/s device-resident "
          f"({videos_per_s_packed:.1f} with --pack_subs; analytic V100: "
          f"{v100_vps:.1f}); tunnel upload "
          f"{t_upload*1e3:.0f} ms/batch of {video_bs}",
          file=sys.stderr, flush=True)
    print(f"# phase2: {queries_per_s_packed:.1f} queries/s packed "
          f"({queries_per_s:.1f} unpacked) against {n_videos} videos "
          f"(analytic V100: {v100_qps:.1f})", file=sys.stderr, flush=True)
    result = {
        "metric": "vcmr_serve_queries_per_sec_per_chip",
        "value": round(queries_per_s_packed, 1),
        "unit": "queries/s",
        "vs_baseline": round(queries_per_s_packed / v100_qps, 3),
        "layout": "fused --pack_queries serving program (one XLA launch "
                  "per 512-query set), device-resident packed arrays; "
                  "realistic ~N(15,4) BPE query lengths in the 30 bucket",
        "corpus_videos": n_videos,
        "host_pack_ms": round(t_hostpack * 1e3, 2),
        "packed_upload_ms": round(t_packed_upload * 1e3, 1),
        "runs_queries_per_sec": [round(n_queries / t, 1)
                                 for t in score_packed_runs],
        "unpacked_queries_per_sec": round(queries_per_s, 1),
        "unpacked_vs_baseline": round(queries_per_s / v100_qps, 3),
        "unpacked_runs_queries_per_sec": [round(n_queries / t, 1)
                                          for t in score_runs],
        "phase1_videos_per_sec": round(videos_per_s, 1),
        "phase1_videos_per_sec_packed": round(videos_per_s_packed, 1),
        "phase1_vs_baseline": round(videos_per_s / v100_vps, 3),
        "phase1_packed_vs_baseline": round(
            videos_per_s_packed / v100_vps, 3),
        "phase1_tunnel_upload_ms_per_batch": round(t_upload * 1e3, 1),
        "phase1_runs_videos_per_sec": [round(n_rep * video_bs / t, 1)
                                       for t in embed_runs],
        "phase1_packed_runs_videos_per_sec": [
            round(n_rep * video_bs / t, 1) for t in embed_packed_runs],
    }
    print(json.dumps(result))
    if write_artifact:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_SERVE.json")
        with open(path, "w") as f:
            json.dump(result, f, indent=2)
    return result


if __name__ == "__main__":
    main()
