"""TVC caption generation → submission jsonl (reference ``inf_tvc.py``).

Covers every clip EXACTLY once: the input is either a raw clip jsonl
(``--target_clip``, reference TvcEvalDataset, data/tvc.py:221-291) or the
caption store's clip.db (TvcValDataset, :164-219).  Greedy (default) or
beam decoding with the KV-cached decoder; if a RoBERTa tokenizer is
available (transformers), token ids are detokenized into text like the
reference; otherwise space-joined ids are emitted.

Output rows match the reference submission schema (inf_tvc.py:92-97):
``{"vid_name", "clip_id", "ts", "descs": [{"desc"}]}``.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from hero_tpu.data.downstream_tasks import (TvcCaptionStore, TvcClipDataset,
                                            build_tvc_clip_batch)
from hero_tpu.drivers import common
from hero_tpu.drivers.eval_vcmr import load_serve_opts, resolve_checkpoint
from hero_tpu.models import tvc as tvc_lib
from hero_tpu.utils.logger import LOGGER
from hero_tpu.utils.misc import params_to_device


def detokenizer():
    try:
        from transformers import RobertaTokenizer
        tok = RobertaTokenizer.from_pretrained("roberta-base")
        return lambda ids: tok.decode(ids, skip_special_tokens=True)
    except Exception:
        LOGGER.warning("RobertaTokenizer unavailable; emitting token ids")
        return None


def generate_clip_captions(params, cfg, ds: TvcClipDataset, *, bos, eos,
                           batch_size: int = 8, max_gen_step: int = 30,
                           beam: int = 1, detok=None):
    """Decode every clip in ``ds`` once → reference submission records.

    The final partial batch is padded by repeating the last item (fixed
    shapes, no recompile); padded/duplicate rows are dropped via the
    per-row clip-id meta.
    """
    decode_fn = tvc_lib.beam_decode if beam > 1 else tvc_lib.greedy_decode
    kwargs = {"beam": beam} if beam > 1 else {}
    # one jitted program with params as an ARGUMENT (closing host params
    # into the eager scan would bake flagship-size weight constants into
    # the compiled program and blow the remote-compile request limit);
    # fixed batch shape -> single compile for the whole dataset
    decode = jax.jit(lambda p, b: decode_fn(p, cfg, b,
                                            max_step=max_gen_step,
                                            bos=bos, eos=eos, **kwargs))
    params = params_to_device(params)
    records, seen = [], set()
    bs = max(1, min(batch_size, len(ds)))
    for s in range(0, len(ds), bs):
        idx = list(range(s, min(s + bs, len(ds))))
        while len(idx) < bs:       # repeat-pad tail; deduped below
            idx.append(idx[-1])
        batch = build_tvc_clip_batch(ds, idx)
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if not k.startswith("__")}
        ids = np.asarray(decode(params, jb))
        for ri, cid in enumerate(batch["__clip_ids__"]):
            if cid is None or cid in seen:
                continue           # padded clip slot / repeated tail item
            seen.add(cid)
            toks = []
            for t in ids[ri].tolist():
                if t == eos:
                    break
                toks.append(int(t))
            desc = detok(toks) if detok else " ".join(map(str, toks))
            try:
                clip_id = int(cid)
            except (TypeError, ValueError):
                clip_id = cid
            records.append({"vid_name": batch["__vids__"][ri],
                            "clip_id": clip_id,
                            "ts": batch["__ts__"][ri],
                            "descs": [{"desc": desc}]})
    return records


def main(args):
    from hero_tpu.parallel.mesh import init_distributed
    init_distributed()
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
    ds_kw = dict(clips_per_item=getattr(opts, "clips_per_item", 4),
                 seg_len=opts.max_clip_len,
                 distributed=jax.process_count() > 1,
                 rank=jax.process_index(), world_size=jax.process_count())
    if args.target_clip:
        ds = TvcClipDataset.from_jsonl(video_db, args.target_clip, **ds_kw)
    else:
        ds = TvcClipDataset.from_caption_db(video_db, cap_db, **ds_kw)
    records = generate_clip_captions(
        params, cfg, ds, bos=cap_db.bos, eos=cap_db.eos,
        batch_size=getattr(opts, "val_batch_size", 8),
        max_gen_step=getattr(opts, "max_gen_step", 30), beam=args.beam,
        detok=detokenizer())

    from hero_tpu.parallel.mesh import host_allgather, is_primary
    records = [r for rs in host_allgather(records) for r in rs]
    if not is_primary():
        return records
    with open(args.submission, "w") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")
    LOGGER.info("wrote %d captions to %s", len(records), args.submission)
    if args.reference:
        from hero_tpu.evaluation.caption_metrics import TVCEval
        scores = TVCEval(args.reference)(records)
        print(json.dumps(scores))
        # metric artifact next to the submission; carries METEOR_variant
        # so published numbers are self-describing (VERDICT r3 #7)
        with open(args.submission + ".scores.json", "w") as f:
            json.dump(scores, f, indent=2)
        return scores
    return records


def build_argparser():
    p = argparse.ArgumentParser("hero_tpu inf_tvc")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--target_clip", default=None,
                   help="clip jsonl to generate for (reference "
                        "--target_clip); default: clip.db of the train "
                        "caption store")
    p.add_argument("--target_clip_db", default=None)
    p.add_argument("--submission", default="tvc_submission.jsonl")
    p.add_argument("--beam", default=1, type=int)
    p.add_argument("--reference", default=None,
                   help="GT jsonl for CIDEr/BLEU/ROUGE scoring")
    return p


if __name__ == "__main__":
    main(build_argparser().parse_args())
