"""TVC caption generation → submission jsonl (reference ``inf_tvc.py``).

Greedy (default) or beam decoding with the KV-cached decoder; if a
RoBERTa tokenizer is available (transformers), token ids are detokenized
into text like the reference; otherwise ids are emitted.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from hero_tpu.data.downstream_tasks import (TvcCaptionStore,
                                            TvcTrainDataset,
                                            build_tvc_batch)
from hero_tpu.drivers import common
from hero_tpu.drivers.eval_vcmr import load_serve_opts, resolve_checkpoint
from hero_tpu.models import tvc as tvc_lib
from hero_tpu.utils.logger import LOGGER


def detokenizer():
    try:
        from transformers import RobertaTokenizer
        tok = RobertaTokenizer.from_pretrained("roberta-base")
        return lambda ids: tok.decode(ids, skip_special_tokens=True)
    except Exception:
        LOGGER.warning("RobertaTokenizer unavailable; emitting token ids")
        return None


def main(args):
    opts = load_serve_opts(args.output_dir)
    cfg = common.model_config_from_opts(opts)
    params = tvc_lib.init_hero_for_tvc(jax.random.PRNGKey(0), cfg)
    ckpt = resolve_checkpoint(args.output_dir, args.checkpoint)
    params = common.load_checkpoint_into(params, ckpt,
                                         cfg.f_config.vocab_size)

    shapes = common.shapes_from_opts(opts)
    video_db = common.load_video_sub_dataset(opts, shapes)
    cap_db = TvcCaptionStore(args.target_clip_db or opts.cap_db,
                             max_txt_len=opts.max_txt_len)
    ds = TvcTrainDataset(video_db, cap_db, caps_per_video=2,
                         cap_len=opts.max_txt_len + 2,
                         seg_len=opts.max_clip_len)
    detok = detokenizer()
    bos, eos = cap_db.bos, cap_db.eos
    decode = (tvc_lib.beam_decode if args.beam > 1
              else tvc_lib.greedy_decode)

    records = []
    bs = getattr(opts, "val_batch_size", 8)
    for s in range(0, len(ds), bs):
        idx = list(range(s, min(s + bs, len(ds))))
        batch = build_tvc_batch(ds, idx)
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if not k.startswith("__")}
        kwargs = {"beam": args.beam} if args.beam > 1 else {}
        ids = np.asarray(decode(params, cfg, jb,
                                max_step=getattr(opts, "max_gen_step", 30),
                                bos=bos, eos=eos, **kwargs))
        for ci, cap_id in enumerate(batch["__cap_ids__"]):
            toks = []
            for t in ids[ci].tolist():
                if t == eos:
                    break
                toks.append(int(t))
            desc = detok(toks) if detok else " ".join(map(str, toks))
            records.append({"clip_id": cap_id,
                            "descs": [{"desc": desc}]})
    with open(args.submission, "w") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")
    LOGGER.info("wrote %d captions to %s", len(records), args.submission)
    if args.reference:
        from hero_tpu.evaluation.caption_metrics import TVCEval
        scores = TVCEval(args.reference)(records)
        print(json.dumps(scores))
        return scores
    return records


def build_argparser():
    p = argparse.ArgumentParser("hero_tpu inf_tvc")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--target_clip_db", default=None)
    p.add_argument("--submission", default="tvc_submission.jsonl")
    p.add_argument("--beam", default=1, type=int)
    p.add_argument("--reference", default=None,
                   help="GT jsonl for CIDEr/BLEU/ROUGE scoring")
    return p


if __name__ == "__main__":
    main(build_argparser().parse_args())
