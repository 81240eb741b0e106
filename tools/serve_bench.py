"""Serve-path benchmark: two-phase VCMR corpus eval throughput on one chip.

Phase 1 embeds a synthetic 2000-video x 100-frame corpus; phase 2 scores
query batches against it through the fused scorer (softmax spans, exp
sharpening, top-k videos, span cube + band mask, exact two-level top-k).
Reports phase-1 videos/s and phase-2 queries/s (the serving number).
"""

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


def main(n_videos=2000, video_bs=50, n_queries=512, query_bs=64):
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
    t0 = time.perf_counter()
    frame_embs, frame_masks = embed_video_corpus(
        params, cfg, video_batches(n_videos), opts.max_clip_len,
        jnp.bfloat16)
    float(jnp.sum(frame_masks))        # tunnel sync = value fetch
    t_embed = time.perf_counter() - t0

    scorer, max_v = make_query_scorer(params, cfg, vsm, opts, frame_embs,
                                      frame_masks, jnp.bfloat16)
    r = np.random.RandomState(0)
    q_ids = jnp.asarray(r.randint(3, 50265, (query_bs, 30)).astype(np.int32))
    q_mask = jnp.ones((query_bs, 30), jnp.float32)
    out = scorer(q_ids, q_mask)        # compile
    float(jnp.sum(out[5]))
    t0 = time.perf_counter()
    for _ in range(n_queries // query_bs):
        out = scorer(q_ids, q_mask)
    float(jnp.sum(out[5]))
    t_score = time.perf_counter() - t0

    print(f"phase1: {n_videos / t_embed:.1f} videos/s "
          f"({t_embed:.1f}s for {n_videos})", flush=True)
    print(f"phase2: {n_queries / t_score:.1f} queries/s "
          f"against {n_videos} videos", flush=True)


if __name__ == "__main__":
    main()
