"""Worker + shared case builder for the 2-process distributed-eval test.

Run as ``python tests/mp_eval_worker.py <rank> <nproc> <port> <out.json>``:
initializes ``jax.distributed`` over gloo on CPU, evaluates this rank's
query shard through ``validate_full_vcmr`` and writes the (globally
merged) metrics to ``out.json``.  The test compares the merge against a
single-process run over all queries (reference eval_vcmr.py:125-140,
430-448: queries sharded per rank, metrics all-gathered and
example-weighted).
"""

import dataclasses
import json
import sys

N_QUERIES = 6
N_VIDEOS = 6
INTERVAL = 1.5


def build_case():
    """Deterministic tiny corpus + queries, identical in every process."""
    import numpy as np
    from hero_tpu.data import synthetic

    shape = dataclasses.replace(synthetic.TINY, batch=3)
    video_ids = [f"vid{i}" for i in range(N_VIDEOS)]
    video2idx = {v: 100 + i for i, v in enumerate(video_ids)}
    r = np.random.RandomState(0)
    gt_vids = [video_ids[r.randint(N_VIDEOS)] for _ in range(N_QUERIES)]
    ts = []
    for _ in range(N_QUERIES):
        st = r.randint(0, shape.n_frames // 2)
        ts.append([st * INTERVAL, (st + r.randint(2, 6)) * INTERVAL])
    query_data = {q: {"desc_id": q, "desc": "", "vid_name": gt_vids[q],
                      "ts": ts[q], "type": "vt"}
                  for q in range(N_QUERIES)}
    query_ids = r.randint(3, 128, (N_QUERIES, 6)).astype(np.int32)

    def video_batches():
        for i in range(2):
            yield synthetic.base_batch(shape, seed=10 + i)

    return shape, video_ids, video2idx, gt_vids, query_data, query_ids, \
        video_batches


def run_eval(rank: int, world: int):
    import jax.numpy as jnp
    import numpy as np
    import jax
    from hero_tpu.config.model_config import tiny_hero_config
    from hero_tpu.evaluation.vcmr_eval import (VcmrEvalOpts,
                                               validate_full_vcmr)
    from hero_tpu.models import pretrain

    (shape, video_ids, video2idx, gt_vids, query_data, query_ids,
     video_batches) = build_case()
    cfg = tiny_hero_config()
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(0), cfg)
    vsm = pretrain.VsmConfig(lw_neg_ctx=1.0, lw_neg_q=1.0, lw_st_ed=0.01)

    shard = list(range(rank, N_QUERIES, world))
    query_batches = [{
        "qids": [q for q in shard],
        "vids": [gt_vids[q] for q in shard],
        "query_input_ids": query_ids[shard],
        "query_attn_masks": np.ones((len(shard), 6), np.float32),
    }]
    opts = VcmrEvalOpts(max_vcmr_video=6, min_pred_l=2, max_pred_l=8,
                        max_before_nms=50, max_after_nms=20, nms_thd=-1.0,
                        vfeat_interval=INTERVAL,
                        max_clip_len=shape.n_frames)
    val_log, submission, metrics = validate_full_vcmr(
        params, cfg, vsm, opts, video_batches(), query_batches,
        video_ids, video2idx, query_data, dtype=jnp.float32)
    # the returned submission must be globally merged: EVERY query id
    # present on every rank, not just this rank's shard
    sub_qids = sorted(r["desc_id"] for r in submission["VCMR"])
    return val_log, metrics, sub_qids


def main():
    rank, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=rank,
                               initialization_timeout=300)
    sys.path.insert(0, ".")
    val_log, metrics, sub_qids = run_eval(rank, nproc)
    with open(out, "w") as f:
        json.dump({"rank": rank, "val_log": val_log, "metrics": metrics,
                   "sub_qids": sub_qids}, f)


if __name__ == "__main__":
    main()
