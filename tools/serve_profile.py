"""Stage-level breakdown of the fused packed phase-2 serve scorer on the
real chip.

Synthesizes the corpus tensor directly (no phase-1 encode) and times, as
separately-jitted programs:
  (0) a trivial program — the tunnel's fixed fetch overhead, to subtract
      from every other row (block_until_ready does not synchronize
      through the axon tunnel, so each timing pays one scalar fetch)
  (a) packed query encode alone
  (b) corpus einsums + conv (st/ed/scores) alone
  (c) rank (sharpen / video top-k / band / chunked exact top-k) alone
  (d) the fused whole program

Round-5 numbers (v5e, 512 queries x 2000 videos x 100 frames, median of
5): overhead 25.2 ms; encode 20 ms, einsums+conv 27 ms, rank 61 ms ->
19 ms after the chunked exact top-k landed (evaluation/vcmr_eval.py
_make_ranker), fused 108 ms -> see BENCH_SERVE.json.

Usage: python tools/serve_profile.py
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from hero_tpu.evaluation.vcmr_eval import (VcmrEvalOpts, pack_query_arrays,
                                           make_fused_packed_scorer,
                                           _make_ranker, _mod_query_sim)
from hero_tpu.models import pretrain
from hero_tpu.utils.misc import enable_fast_rng


def timeit(name, fn, sync, n=5):
    sync(fn())  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    med = ts[len(ts) // 2]
    print(f"{name}: {med*1e3:.2f} ms (runs {[round(t*1e3,2) for t in ts]})",
          flush=True)
    return med


def main():
    enable_fast_rng()
    import bench
    cfg = bench.flagship_config()
    vsm = pretrain.VsmConfig(lw_neg_ctx=8.0, lw_neg_q=8.0, lw_st_ed=0.01)
    params = jax.device_put(
        pretrain.init_hero_for_pretraining(jax.random.PRNGKey(0), cfg))

    Nv, L, D = 2000, 100, 768
    n_queries = 512
    r = np.random.RandomState(0)
    frame_embs = jax.device_put(jnp.asarray(
        r.randn(Nv, L, D).astype(np.float32) * 0.05, jnp.bfloat16))
    frame_masks = jax.device_put(jnp.asarray(np.ones((Nv, L), np.float32)))
    opts = VcmrEvalOpts(max_vcmr_video=100, min_pred_l=2, max_pred_l=16,
                        max_before_nms=200, vfeat_interval=1.5,
                        max_clip_len=L)

    q_len_bucket = 30
    all_lens = np.clip(np.round(r.normal(15.0, 4.0, n_queries)), 5,
                       q_len_bucket).astype(np.int64)
    all_q_ids = r.randint(3, 50265,
                          (n_queries, q_len_bucket)).astype(np.int32)
    p_ids, p_seg, p_pos, gather = pack_query_arrays(
        all_q_ids, all_lens, max_segs=4, rows_per_call=32)
    jp = [jax.device_put(jnp.asarray(x))
          for x in (p_ids, p_seg, p_pos, gather)]
    print(f"packed rows: {p_ids.shape[0]} x {p_ids.shape[1]}", flush=True)

    @jax.jit
    def noop(x):
        return jnp.sum(x) * 2.0

    timeit("overhead(tunnel fetch)", lambda: noop(jnp.ones((8,))),
           lambda o: float(o))

    @functools.partial(jax.jit, static_argnames=())
    def enc_only(params, ids, seg, pos):
        return pretrain.encode_query_packed(params, cfg, ids, seg, pos, 4,
                                            dtype=jnp.bfloat16)

    timeit("encode_packed", lambda: enc_only(params, jp[0], jp[1], jp[2]),
           lambda o: float(jnp.sum(o[0, 0])))

    mod = jax.device_put(jnp.take(
        enc_only(params, jp[0], jp[1], jp[2]).reshape(-1, D),
        jp[3], axis=0))

    @jax.jit
    def preds_only(params, mod, fe, fm):
        return _mod_query_sim(params, mod, fe, fm)

    timeit("einsums(sim+scores)",
           lambda: preds_only(params, mod, frame_embs, frame_masks),
           lambda o: float(jnp.sum(o[1][0])))

    sim, scores, fmask32 = map(
        jax.device_put, preds_only(params, mod, frame_embs, frame_masks))
    rank, _ = _make_ranker(opts, Nv, Nv, L)
    rank_j = jax.jit(rank)
    gt = jnp.zeros((n_queries,), jnp.int32)
    timeit("rank(conv_sel/topk/band)",
           lambda: rank_j(sim, scores, gt, params["head"], fmask32),
           lambda o: float(jnp.sum(o[4])))

    fused, _ = make_fused_packed_scorer(params, cfg, vsm, opts, frame_embs,
                                        frame_masks, jnp.bfloat16)
    timeit("fused total", lambda: fused(*jp),
           lambda o: float(jnp.sum(o[4])))
    print("OK", flush=True)


if __name__ == "__main__":
    main()
