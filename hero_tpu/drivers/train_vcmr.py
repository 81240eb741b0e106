"""TVR/How2R/DiDeMo VCMR finetuning driver (reference ``train_vcmr.py``).

Usage: ``python -m hero_tpu.drivers.train_vcmr --config <json>`` — accepts
the reference's ``config/train-tvr-8gpu.json`` schema verbatim (db paths
point at herostore dirs).  One jit'd sharded train step over the device
mesh; inline full-corpus VCMR validation every ``valid_steps``.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from hero_tpu.config import opts as opts_lib
from hero_tpu.data.downstream_tasks import (VcmrDataset,
                                            VcmrFullEvalDataset,
                                            build_batch)
from hero_tpu.data.loader import dataset_iterator
from hero_tpu.data.store import QueryTokStore
from hero_tpu.data.video import stack_items
from hero_tpu.drivers import common
from hero_tpu.evaluation.vcmr_eval import validate_full_vcmr
from hero_tpu.models import pretrain as pretrain_lib
from hero_tpu.parallel.mesh import divisor_mesh, is_primary
from hero_tpu.parallel import pipeline
from hero_tpu.training.optim import AdamWConfig
from hero_tpu.training.save import (AsyncCheckpointWriter,
                                    ModelSaver, TrainingRestorer,
                                    save_training_meta)
from hero_tpu.training.step import (TrainSpec, TrainState,
                                    make_sharded_train_step, shard_state)
from hero_tpu.utils.logger import LOGGER, add_log_to_file
from hero_tpu.utils.misc import set_random_seed


def build_eval_inputs(video_db, query_db, opts):
    """Video batches + query batches + metadata for validate_full_vcmr."""
    if hasattr(video_db.txt_db, "id2len") and video_db.txt_db.id2len:
        video_ids = sorted(video_db.txt_db.id2len.keys())
    else:
        video_ids = sorted(video_db.vids)
    video2idx_global = None
    v2i = video_db.vid2idx
    if v2i:
        # SubTokStore vid2idx is {split: {vid: idx}} (vid2dur_idx.json)
        for split in ("val", "train", "test"):
            if split in v2i:
                video2idx_global = v2i[split]
                break
    if video2idx_global is None:
        video2idx_global = {v: i for i, v in enumerate(video_ids)}
    video_ids = sorted(video2idx_global.keys())

    def video_batches():
        bs = getattr(opts, "vcmr_eval_video_batch_size", 50)
        for s in range(0, len(video_ids), bs):
            items = [video_db.video_item(v) for v in video_ids[s:s + bs]]
            if len(items) < bs and s > 0:
                # pad the ragged FINAL batch to the fixed size with
                # zero-mask dummy videos so phase 1 compiles exactly once
                # (VERDICT r3 #6); pad rows carry c_attn_masks == 0, so
                # their video-level scores are mask_logits'd to -1e4 and
                # the scorer additionally force-ranks rows >= n_real_videos
                # below every real video (vcmr_eval.make_query_scorer)
                pad_item = {k: np.zeros_like(v) for k, v in items[0].items()}
                items.extend([pad_item] * (bs - len(items)))
            yield stack_items(items)

    import jax as _jax
    distributed = bool(getattr(opts, "distributed_eval", False))
    full_eval = VcmrFullEvalDataset(
        list(query_db.id2len.keys()), query_db, video_db.shapes,
        distributed=distributed, rank=_jax.process_index(),
        world_size=_jax.process_count())
    query_batches = full_eval.batches(
        getattr(opts, "vcmr_eval_batch_size", 80))
    return (video_batches(), query_batches, video_ids, video2idx_global,
            query_db.query_data)


def main(opts, *, dataset_cls=VcmrDataset, query_store_cls=QueryTokStore):
    """``dataset_cls``/``query_store_cls`` parameterize the VR variant
    (reference train_vr.py = train_vcmr minus span, with
    MsrvttQueryTokLmdb — data/vr.py:50-61) without mutating module
    globals; drivers/train_vr.py passes VrDataset/MsrvttQueryTokStore."""
    from hero_tpu.parallel.mesh import init_distributed
    init_distributed()
    set_random_seed(opts.seed)
    from hero_tpu.utils.misc import enable_fast_rng
    enable_fast_rng()
    os.makedirs(opts.output_dir, exist_ok=True)
    save_training_meta(opts.output_dir, vars(opts),
                       {"model_config": opts.model_config})
    add_log_to_file(os.path.join(opts.output_dir, "log", "log.txt"))
    mesh = pipeline.driver_mesh(opts, opts.train_batch_size)
    LOGGER.info("devices: %s (mesh %d)", jax.devices(),
                mesh.devices.size)

    shapes = common.shapes_from_opts(opts).replace(n_queries=1)
    if common.is_video_only_task(getattr(opts, "task", "tvr")):
        video_db = common.load_video_only_dataset(opts, shapes)
        train_vids = list(video_db.vids)
    else:
        video_db = common.load_video_sub_dataset(opts, shapes)
        train_vids = list(video_db.txt_db.id2len.keys())
    query_db = query_store_cls(opts.train_query_txt_db,
                               max_txt_len=opts.max_txt_len)
    train_ds = dataset_cls(train_vids, video_db,
                           query_db, sampled_by_q=True, seed=opts.seed)
    LOGGER.info("train: %d queries over %d videos", len(train_ds),
                len(video_db))

    cfg = common.model_config_from_opts(opts)
    vsm = common.vsm_config_from_opts(opts)
    params = pretrain_lib.init_hero_for_pretraining(
        jax.random.PRNGKey(opts.seed), cfg, vsm)
    ckpt_info = {}
    if opts.checkpoint:
        params = common.load_checkpoint_into(params, opts.checkpoint,
                                             cfg.f_config.vocab_size,
                                             info=ckpt_info)

    curriculum = common.Curriculum(opts)

    def loss_fn(p, batch, rng):
        cur = {k: batch.pop(k) for k in ("use_hard_negative",
                                         "hard_pool_size",
                                         "hard_neg_weight", "lw_st_ed")}
        a, b, c = pretrain_lib.forward_vsm(
            p, cfg, vsm, batch, rng=rng, train=True, dtype=jnp.bfloat16,
            **cur)
        return a + b + c, {"loss_st_ed": a, "loss_neg_ctx": b,
                           "loss_neg_q": c}

    accum = max(opts.gradient_accumulation_steps, 1)
    spec = TrainSpec(learning_rate=opts.learning_rate,
                     warmup_steps=opts.warmup_steps,
                     num_train_steps=opts.num_train_steps,
                     grad_norm=opts.grad_norm,
                     lr_schedule=getattr(opts, "lr_sched",
                                         "warmup_linear"),
                     adamw=AdamWConfig(beta1=opts.betas[0],
                                       beta2=opts.betas[1],
                                       weight_decay=opts.weight_decay,
                                       lr_mul=getattr(opts, "lr_mul", 1.0)))
    zero1 = bool(getattr(opts, "zero1", False))
    step_fn = make_sharded_train_step(loss_fn, spec, mesh,
                                      accum_steps=accum, zero1=zero1)
    state = shard_state(TrainState.create(params), mesh, zero1=zero1)
    ckpt_writer = AsyncCheckpointWriter()   # file I/O off the train loop
    restorer = TrainingRestorer(opts.output_dir,
                                {"num_train_steps": opts.num_train_steps,
                                 "learning_rate": opts.learning_rate},
                                writer=ckpt_writer)
    if restorer.can_restore():
        state = shard_state(restorer.restore(state), mesh, zero1=zero1)
    saver = ModelSaver(os.path.join(opts.output_dir, "ckpt"),
                       vocab_padded=ckpt_info.get("vocab_padded"),
                       writer=ckpt_writer)

    def batches():
        it = dataset_iterator(train_ds, build_batch,
                              opts.train_batch_size)
        if restorer.global_step:
            it.skip(restorer.global_step * accum)
        for batch in it:
            batch = {k: v for k, v in batch.items()
                     if not k.startswith("__")}
            yield "tvr", batch

    def validate(state, step):
        # every process enters validation (host_allgather inside merges
        # per-process query shards); writes are rank-0-gated inside
        run_validation(state, cfg, vsm, video_db, opts, step,
                       query_store_cls=query_store_cls)

    # the shared loop brings the SIGTERM preemption hook, primary-gated
    # restore.npz writes, and the end-of-run validate/save dedup (the old
    # hand-rolled loop re-validated + re-saved when num_train_steps was a
    # multiple of valid_steps — two full-corpus evals back to back)
    common.run_training(opts, mesh, step_fn, state, batches(),
                        extras_fn=curriculum.at, validate_fn=validate,
                        saver=saver, restorer=restorer)


def run_validation(state, cfg, vsm, video_db, opts, step, *,
                   query_store_cls=QueryTokStore):
    if not getattr(opts, "val_query_txt_db", None):
        return
    val_qdb = query_store_cls(opts.val_query_txt_db,
                              max_txt_len=opts.max_txt_len)
    (vb, qb, video_ids, v2i_global, qdata) = build_eval_inputs(
        video_db, val_qdb, opts)
    # params stay ON DEVICE (validate_full_vcmr's device_put is then a
    # no-op) — a device_get here costs a full D2H+H2D model round-trip
    # per validation (~minutes at flagship size through the tunnel)
    val_log, submission, metrics = validate_full_vcmr(
        state.params, cfg, vsm, common.eval_opts_from(opts),
        vb, qb, video_ids, v2i_global, qdata)
    if not is_primary():
        return  # collectives above ran on every process; writes are rank-0
    if metrics:
        for task, m in metrics.items():
            LOGGER.info("[step %d] %s: %s", step, task,
                        {k: round(v, 2) for k, v in m.items()
                         if isinstance(v, float)})
    import json
    with open(os.path.join(opts.output_dir,
                           f"results_{step}_all.json"), "w") as f:
        json.dump(submission, f)


if __name__ == "__main__":
    main(opts_lib.get_vcmr_args())
