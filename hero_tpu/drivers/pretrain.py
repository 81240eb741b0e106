"""Multi-task pretraining driver (reference ``pretrain.py``).

``python -m hero_tpu.drivers.pretrain --config <json>`` with a config
carrying ``targets`` = [{"name", "sub_txt_db", "vfeat_db", "splits":
[{"ratio": [mlm, mfm-nce, fom, vsm], "tasks": [...]}]}]-style entries or
the simplified hero_tpu schema below; one jit'd step per task (4 compiled
graphs), task chosen per optimizer step by the common-RNG MetaLoader.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp

from hero_tpu.config import opts as opts_lib
from hero_tpu.data import pretrain_tasks as pt
from hero_tpu.data.loader import MetaLoader, PrefetchLoader, dataset_iterator
from hero_tpu.drivers import common
from hero_tpu.models import pretrain as pretrain_lib
from hero_tpu.parallel.mesh import divisor_mesh
from hero_tpu.parallel import pipeline
from hero_tpu.training.optim import AdamWConfig
from hero_tpu.training.save import (AsyncCheckpointWriter,
                                    ModelSaver, TrainingRestorer,
                                    save_training_meta)
from hero_tpu.training.step import (TrainSpec, TrainState,
                                    make_sharded_train_step, shard_state)
from hero_tpu.utils.logger import LOGGER, add_log_to_file
from hero_tpu.utils.misc import set_random_seed

DEFAULT_TASKS = {"mlm": 2, "mfm-nce": 2, "fom": 1, "vsm": 2}


def build_targets(opts):
    """Multi-target pretraining (reference build_target_loaders,
    pretrain.py:44-57): each target carries its own dbs (HowTo100M-style
    ``vfeat_shards`` supported) and task ratios; loader names are
    ``{task}@{target}``.  Falls back to the single-target opts schema."""
    from hero_tpu.data.store import (ShardedVideoFeatStore, SubTokStore,
                                     VideoFeatStore)
    from hero_tpu.data.video import VideoFeatSubTokDataset

    targets = getattr(opts, "targets", None)
    if not targets:
        shapes = common.shapes_from_opts(opts)
        video_db = common.load_video_sub_dataset(opts, shapes)
        return {"": video_db}, None
    shapes = common.shapes_from_opts(opts)
    out = {}
    ratios = {}
    tgt_ratios = getattr(opts, "targets_ratio", None) or [1] * len(targets)
    for tgt, tr in zip(targets, tgt_ratios):
        sub = SubTokStore(tgt["sub_txt_db"],
                          max_clip_len=opts.max_clip_len)
        interval = tgt.get("vfeat_interval", opts.vfeat_interval)
        if "vfeat_shards" in tgt:
            vfeat = ShardedVideoFeatStore(
                tgt["vfeat_shards"], frame_interval=interval,
                max_clip_len=opts.max_clip_len)
        else:
            vfeat = VideoFeatStore(tgt["vfeat_db"],
                                   frame_interval=interval,
                                   max_clip_len=opts.max_clip_len)
        out[tgt["name"]] = VideoFeatSubTokDataset(
            sub, vfeat, shapes, max_txt_len=opts.max_txt_len,
            sub_ctx_len=opts.sub_ctx_len,
            pack=getattr(opts, "pack_subs", False))
        for task, r in tgt.get("tasks", DEFAULT_TASKS).items():
            ratios[f"{task}@{tgt['name']}"] = r * tr
    return out, ratios


def _bucketize(opts, video_dbs):
    """Optional second compiled bucket (``--second_bucket``): videos the
    primary FixedShapes would truncate are routed to a larger bucket sized
    by :func:`suggest_shapes` at full coverage, so no TV/HowTo100M data is
    silently dropped (the reference keeps everything by padding ragged
    batches to the in-batch max, data/data.py:326-403).  Returns
    {target: (video_db, fit_vids, big_db, big_vids)}."""
    from hero_tpu.data.video import (VideoFeatSubTokDataset, suggest_shapes,
                                     video_fits_bucket)
    out = {}
    for tgt, db in video_dbs.items():
        vids = list(db.txt_db.id2len.keys())
        if not getattr(opts, "second_bucket", False):
            out[tgt] = (db, vids, None, [])
            continue
        fit = [v for v in vids if video_fits_bucket(db, v)]
        big = [v for v in vids if v not in set(fit)]
        if not big:
            out[tgt] = (db, vids, None, [])
            continue
        big_shapes = suggest_shapes(db.txt_db, coverage=1.0,
                                    max_txt_len=db.max_txt_len,
                                    sub_ctx_len=db.sub_ctx_len,
                                    base=db.shapes)
        # the overflow bucket is always UNPACKED: suggest_shapes emits
        # per-sub shapes, and videos landing here are the rare outliers
        # the packer could not fit (db.pack makes the fit test pack-aware)
        big_db = VideoFeatSubTokDataset(db.txt_db, db.img_db, big_shapes,
                                        max_txt_len=db.max_txt_len,
                                        sub_ctx_len=db.sub_ctx_len)
        LOGGER.info("target %r: %d/%d videos exceed the primary bucket; "
                    "second bucket %s", tgt, len(big), len(vids),
                    big_shapes)
        out[tgt] = (db, fit, big_db, big)
    return out


def build_task_datasets(opts, video_dbs, name_ratios=None):
    tasks = {}
    if name_ratios is None:
        ratios = getattr(opts, "task_ratios", None) or DEFAULT_TASKS
        name_ratios = {f"{t}@": r for t, r in ratios.items()}
    buckets = _bucketize(opts, video_dbs)
    # when ANY bucket split occurs, scale EVERY ratio by the same split
    # granularity so relative task/target weights are preserved — scaling
    # only the split names would skew the sampling mix ~8:1 toward
    # bucketized targets in multi-target pretrain
    scale = 8 if any(b[2] is not None for b in buckets.values()) else 1
    expanded = {}
    for name, ratio in name_ratios.items():
        task, _, tgt = name.partition("@")
        db, fit, big_db, big = buckets.get(tgt) or buckets[""]
        if big_db is None:
            expanded[name] = (scale * ratio, db, fit)
            continue
        # split the scaled ratio between buckets proportionally to video
        # counts, conserving the total exactly (so relative weights across
        # targets hold); each bucket gets ≥1 so its videos are trained on
        total = len(fit) + len(big)
        r_big = min(max(1, round(scale * ratio * len(big) / total)),
                    scale * ratio - 1)
        r_fit = scale * ratio - r_big
        expanded[name] = (r_fit, db, fit)
        expanded[name + "#big"] = (r_big, big_db, big)
    for name, (ratio, video_db, vids) in expanded.items():
        task = name.partition("@")[0]
        if task == "vsm":
            ds = pt.VsmDataset(vids, video_db,
                               query_per_video=getattr(
                                   opts, "query_per_video", 5),
                               seed=opts.seed)
        elif task.startswith("mlm"):
            ds = pt.MlmDataset(vids, video_db,
                               mask_prob=getattr(opts, "mask_prob", 0.15),
                               seed=opts.seed)
        elif task in ("mfm-nce", "mffr"):
            ds = pt.MfmDataset(vids, video_db,
                               mask_prob=getattr(opts, "mask_prob", 0.15),
                               seed=opts.seed)
        elif task == "fom":
            ds = pt.FomDataset(vids, video_db, seed=opts.seed)
        else:
            raise ValueError(task)
        tasks[name.rstrip("@")] = (ds, ratio)
    return tasks


def main(opts):
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

    video_dbs, name_ratios = build_targets(opts)
    task_datasets = build_task_datasets(opts, video_dbs, name_ratios)
    LOGGER.info("pretraining targets %s, tasks %s", list(video_dbs),
                {t: r for t, (_, r) in task_datasets.items()})

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

    def make_loss(task):
        if task == "vsm":
            def loss_fn(p, batch, rng):
                cur = {k: batch.pop(k)
                       for k in ("use_hard_negative", "hard_pool_size",
                                 "hard_neg_weight", "lw_st_ed")}
                a, b, c = pretrain_lib.forward_vsm(
                    p, cfg, vsm, batch, rng=rng, train=True,
                    dtype=jnp.bfloat16, **cur)
                return a + b + c, {}
        else:
            def loss_fn(p, batch, rng):
                for k in ("use_hard_negative", "hard_pool_size",
                          "hard_neg_weight", "lw_st_ed"):
                    batch.pop(k, None)
                s, n = pretrain_lib.forward_pretrain(
                    p, cfg, vsm, batch, task, rng=rng, train=True,
                    dtype=jnp.bfloat16,
                    mask_prob=getattr(opts, "mask_prob", 0.15))
                return s / jnp.maximum(n, 1.0), {}
        return loss_fn

    accum = max(opts.gradient_accumulation_steps, 1)
    spec = TrainSpec(learning_rate=opts.learning_rate,
                     warmup_steps=opts.warmup_steps,
                     num_train_steps=opts.num_train_steps,
                     grad_norm=opts.grad_norm,
                     lr_schedule=getattr(opts, "lr_sched",
                                         "warmup_linear"),
                     adamw=AdamWConfig(beta1=opts.betas[0],
                                       beta2=opts.betas[1],
                                       weight_decay=opts.weight_decay))
    zero1 = bool(getattr(opts, "zero1", False))
    step_fns = {t: make_sharded_train_step(
        make_loss(t.partition("@")[0]), spec, mesh, accum_steps=accum,
        zero1=zero1)
        for t in task_datasets}
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

    loaders = {
        t: (dataset_iterator(ds, pt.build_batch, opts.train_batch_size,
                             seed=opts.seed), ratio)
        for t, (ds, ratio) in task_datasets.items()
    }
    meta = MetaLoader(loaders, accum_steps=accum, seed=opts.seed)
    if restorer.global_step:
        # resume replays the exact task/batch schedule: identical seeded
        # RNG draws + cheap index-level skip in every task iterator
        meta.fast_forward(restorer.global_step * accum)
    # run_training prefetches + device_puts in its own thread
    loader = iter(meta)

    def validate(state, step):
        from hero_tpu.evaluation.pretrain_val import validate_pretrain
        n_val = getattr(opts, "n_val_batches", 2)
        bs = getattr(opts, "val_batch_size", opts.train_batch_size)

        def val_batches(ds):
            n = min(n_val * bs, len(ds))
            return [pt.build_batch(ds, list(range(s, min(s + bs, n))))
                    for s in range(0, n, bs)]

        val_loaders = {t: val_batches(ds)
                       for t, (ds, _) in task_datasets.items()}
        # state.params stay on device: the validators take them as jit
        # arguments, so no host round-trip (and no re-upload) is needed
        log = validate_pretrain(state.params, cfg, vsm, val_loaders,
                                mask_prob=getattr(opts, "mask_prob", 0.15))
        LOGGER.info("[step %d] %s", step,
                    {k: round(v, 4) for k, v in log.items()})

    common.run_training(opts, mesh, step_fns, state, loader,
                        extras_fn=curriculum.at, validate_fn=validate,
                        saver=saver, restorer=restorer)
    # bucket audit: how much data the fixed shapes dropped (with
    # --second_bucket, oversized videos are routed instead of truncated)
    for tgt, db in video_dbs.items():
        rep = db.truncation_report()
        if rep["videos_seen"]:
            LOGGER.info("bucket truncation [%s]: %s", tgt or "default",
                        {k: round(v, 4) if isinstance(v, float) else v
                         for k, v in rep.items()})


def cli():
    """Console-script entry (pyproject [project.scripts])."""
    main(opts_lib.get_pretrain_args())


if __name__ == "__main__":
    cli()
