"""TVQA/How2QA finetuning driver (reference ``train_videoQA.py``):
loss = qa CE + lw_st_ed · temporal CE (reference :157-166)."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from hero_tpu.config import opts as opts_lib
from hero_tpu.data.downstream_tasks import VideoQaDataset, build_batch
from hero_tpu.data.loader import PrefetchLoader, dataset_iterator
from hero_tpu.data.store import QueryTokStore
from hero_tpu.drivers import common
from hero_tpu.evaluation.downstream import validate_videoqa
from hero_tpu.models import videoqa as videoqa_lib
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
    A = getattr(opts, "num_answers", 5)
    mesh = pipeline.driver_mesh(opts, opts.train_batch_size * A)

    shapes = common.shapes_from_opts(opts)
    video_db = common.load_video_sub_dataset(opts, shapes)
    qdb = QueryTokStore(opts.train_query_txt_db,
                        max_txt_len=opts.max_txt_len)
    train_ds = VideoQaDataset(list(qdb.id2len.keys()), video_db, qdb,
                              qa_len=getattr(opts, "bucket_query_len", 40))
    LOGGER.info("videoQA train: %d questions", len(train_ds))

    cfg = common.model_config_from_opts(opts)
    params = videoqa_lib.init_hero_for_videoqa(
        jax.random.PRNGKey(opts.seed), cfg)
    ckpt_info = {}
    if opts.checkpoint:
        params = common.load_checkpoint_into(params, opts.checkpoint,
                                             cfg.f_config.vocab_size,
                                             info=ckpt_info)

    lw_st_ed = getattr(opts, "lw_st_ed", 0.4)

    def loss_fn(p, batch, rng):
        qa_loss, t_loss = videoqa_lib.forward_videoqa(
            p, cfg, batch, num_answers=A, rng=rng, train=True,
            dtype=jnp.bfloat16)
        return qa_loss + lw_st_ed * t_loss, {"qa_loss": qa_loss,
                                             "st_ed_loss": t_loss}

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
        it = dataset_iterator(
            train_ds,
            lambda ds, idx: build_batch(ds, idx, flatten_rows=True),
            opts.train_batch_size, seed=opts.seed)
        if restorer.global_step:
            it.skip(restorer.global_step
                    * max(getattr(opts, "gradient_accumulation_steps", 1),
                          1))
        for batch in it:
            yield opts.task, {k: v for k, v in batch.items()
                              if not k.startswith("__")}

    def validate(state, step):
        if not getattr(opts, "val_query_txt_db", None):
            return
        vqdb = QueryTokStore(opts.val_query_txt_db,
                             max_txt_len=opts.max_txt_len)
        val_ds = VideoQaDataset(list(vqdb.id2len.keys()), video_db, vqdb,
                                qa_len=getattr(opts, "bucket_query_len",
                                               40))
        def val_batches():
            bs = min(opts.val_batch_size, len(val_ds))
            # tail batch kept (shorter, like eval_videoqa) — dropping it
            # silently skipped validation whenever len(val_ds) < bs
            for s in range(0, len(val_ds), bs):
                b = build_batch(val_ds,
                                list(range(s, min(s + bs, len(val_ds)))),
                                flatten_rows=True)
                b["qids"] = b.pop("__qid__")
                b["targets_host"] = b["targets"]
                yield {k: v for k, v in b.items()
                       if not k.startswith("__")}
        # params stay on device: the validator jits take them as args
        log, _, _ = validate_videoqa(state.params, cfg,
                                     val_batches(), num_answers=A)
        LOGGER.info("[step %d] videoQA val: %s", step, log)

    common.run_training(opts, mesh, step_fn, state,
                        batches(),
                        validate_fn=validate, saver=saver,
                        restorer=restorer)


if __name__ == "__main__":
    main(opts_lib.get_videoqa_args())
