"""TVC captioning finetune (reference ``train_tvc.py``): label-smoothed
decoder CE with lr_mul'd new layers; validation greedy-decodes and scores
BLEU/ROUGE/CIDEr (METEOR gated on java)."""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from hero_tpu.config import opts as opts_lib
from hero_tpu.data.downstream_tasks import (TvcCaptionStore,
                                            TvcTrainDataset,
                                            build_tvc_batch)
from hero_tpu.data.loader import PrefetchLoader, dataset_iterator
from hero_tpu.drivers import common
from hero_tpu.models import tvc as tvc_lib
from hero_tpu.parallel.mesh import divisor_mesh
from hero_tpu.parallel import pipeline
from hero_tpu.training.optim import AdamWConfig
from hero_tpu.training.save import (AsyncCheckpointWriter,
                                    ModelSaver, TrainingRestorer,
                                    save_training_meta)
from hero_tpu.training.step import (TrainSpec, TrainState,
                                    make_sharded_train_step, shard_state)
from hero_tpu.utils.logger import LOGGER, add_log_to_file
from hero_tpu.utils.misc import params_to_device, set_random_seed


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

    shapes = common.shapes_from_opts(opts)
    video_db = common.load_video_sub_dataset(opts, shapes)
    cap_db = TvcCaptionStore(opts.cap_db, max_txt_len=opts.max_txt_len)
    caps_per_video = getattr(opts, "caps_per_video", 2)
    train_ds = TvcTrainDataset(
        video_db, cap_db, caps_per_video=caps_per_video,
        cap_len=getattr(opts, "bucket_cap_len", opts.max_txt_len + 2),
        seg_len=getattr(opts, "bucket_seg_len", opts.max_clip_len),
        seed=opts.seed)
    LOGGER.info("tvc train: %d videos, %d caps each", len(train_ds),
                caps_per_video)

    cfg = common.model_config_from_opts(opts)
    assert cfg.d_config is not None, "TVC model_config must carry d_config"
    params = tvc_lib.init_hero_for_tvc(jax.random.PRNGKey(opts.seed), cfg)
    ckpt_info = {}
    if opts.checkpoint:
        params = common.load_checkpoint_into(params, opts.checkpoint,
                                             cfg.f_config.vocab_size,
                                             info=ckpt_info)
    lsr = getattr(opts, "lsr", 0.1)

    def loss_fn(p, batch, rng):
        s, n = tvc_lib.forward_tvc(p, cfg, batch, lsr=lsr, rng=rng,
                                   train=True, dtype=jnp.bfloat16)
        return s / jnp.maximum(n, 1.0), {}

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
        it = dataset_iterator(train_ds, build_tvc_batch,
                              opts.train_batch_size, seed=opts.seed)
        if restorer.global_step:
            it.skip(restorer.global_step
                    * max(getattr(opts, "gradient_accumulation_steps", 1),
                          1))
        for batch in it:
            yield "tvc", {k: v for k, v in batch.items()
                          if not k.startswith("__")}

    def validate(state, step):
        from hero_tpu.parallel.mesh import is_primary
        if not is_primary():
            return  # caption generation has no collectives; write is rank-0
        # params stay ON DEVICE (the decode jits take them as arguments) —
        # a device_get would round-trip the full model per validation
        host_params = state.params
        if cap_db.vid2clips:
            # per-clip GT validation (reference TvcValDataset → CIDEr,
            # train_tvc.py validate): every clip decoded exactly once
            from hero_tpu.data.downstream_tasks import TvcClipDataset
            from hero_tpu.drivers.inf_tvc import generate_clip_captions
            val_ds = TvcClipDataset.from_caption_db(
                video_db, cap_db,
                clips_per_item=getattr(opts, "clips_per_item", 4),
                seg_len=getattr(opts, "bucket_seg_len", opts.max_clip_len))
            gen = generate_clip_captions(
                host_params, cfg, val_ds, bos=cap_db.bos, eos=cap_db.eos,
                batch_size=opts.val_batch_size,
                max_gen_step=getattr(opts, "max_gen_step", 30))
            scores = score_clip_captions(gen, val_ds)
        else:
            gen = generate_captions(host_params, cfg, train_ds, opts)
            scores = score_token_captions(gen, cap_db)
        path = os.path.join(opts.output_dir, f"tvc_gen_{step}.jsonl")
        with open(path, "w") as f:
            for rec in gen:
                f.write(json.dumps(rec) + "\n")
        LOGGER.info("[step %d] wrote %d captions to %s — %s", step,
                    len(gen), path, scores)

    common.run_training(opts, mesh, step_fn, state,
                        batches(),
                        validate_fn=validate, saver=saver,
                        restorer=restorer)


def score_clip_captions(gen, val_ds):
    """BLEU-4/ROUGE-L/CIDEr of generated per-clip captions against the
    clip.db GT texts (reference train_tvc.py validate → TVCEval)."""
    from hero_tpu.evaluation import caption_metrics as cm
    gt_map = {str(cid): g for _, rows in val_ds.items
              for cid, _, g in rows if g}
    gts, res = {}, {}
    for rec in gen:
        cid = str(rec["clip_id"])
        if cid not in gt_map:
            continue
        gts[cid] = [t.split() for t in gt_map[cid]]
        res[cid] = rec["descs"][0]["desc"].split()
    if not res:
        return {}
    return {"Bleu@4": round(cm.bleu(gts, res)[3], 4),
            "ROUGE-L": round(cm.rouge_l(gts, res), 4),
            "CIDEr": round(cm.cider_d(gts, res), 4)}


def score_token_captions(gen, cap_db):
    """BLEU-4/ROUGE-L/CIDEr over token-id sequences (the reference scores
    detokenized text via TVCEval, eval/tvc.py — token-level scoring is an
    equivalent training-time monitor; inf_tvc does the detokenized scoring
    when a reference jsonl + tokenizer are available)."""
    from hero_tpu.evaluation import caption_metrics as cm
    gts, res = {}, {}
    for rec in gen:
        cid = str(rec["clip_id"])
        gt = cap_db[cid]
        gts[cid] = [[str(t) for t in gt["input_ids"][1:]]]  # drop BOS
        res[cid] = [str(t) for t in rec["descs"][0]["desc_token_ids"]]
    if not res:
        return {}
    return {"Bleu@4": round(cm.bleu(gts, res)[3], 4),
            "ROUGE-L": round(cm.rouge_l(gts, res), 4),
            "CIDEr": round(cm.cider_d(gts, res), 4)}


def generate_captions(params, cfg, dataset, opts, n_batches: int = 4):
    """Greedy decode a few batches → submission records
    (reference TvcGenerator + inf_tvc.py schema)."""
    bos = dataset.caption_db.bos
    eos = dataset.caption_db.eos
    out = []
    bs = min(opts.val_batch_size, len(dataset))
    # one jitted program with params as an ARGUMENT (closing host params
    # into the eager scan bakes flagship-size weight constants into the
    # program — CLAUDE.md jit-arguments rule; cf. inf_tvc)
    decode = jax.jit(lambda p, b: tvc_lib.greedy_decode(
        p, cfg, b, max_step=getattr(opts, "max_gen_step", 30),
        bos=bos, eos=eos, dtype=jnp.bfloat16))
    params = params_to_device(params)
    for s in range(0, min(n_batches * bs, len(dataset) - bs + 1), bs):
        batch = build_tvc_batch(dataset, list(range(s, s + bs)))
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if not k.startswith("__")}
        ids = np.asarray(decode(params, jb))
        # build_tvc_batch emits caps_per_video caption rows per video row
        caps_per_video = max(
            1, len(batch["__cap_ids__"]) // len(batch["__vids__"]))
        for ci, cap_id in enumerate(batch["__cap_ids__"]):
            toks = []
            for t in ids[ci].tolist():
                if t == eos:
                    break
                toks.append(int(t))
            out.append({"clip_id": cap_id, "descs": [{"desc_token_ids":
                                                      toks}],
                        "vid_name": batch["__vids__"][ci // caps_per_video]})
    return out


if __name__ == "__main__":
    main(opts_lib.get_tvc_args())
