"""Standalone VideoQA inference (reference ``eval_videoQA.py``): answer
argmax + accuracy, optional logits dump."""

from __future__ import annotations

import argparse
import json
import os
import pickle

import jax

from hero_tpu.data.downstream_tasks import VideoQaDataset, build_batch
from hero_tpu.data.store import QueryTokStore
from hero_tpu.drivers import common
from hero_tpu.drivers.eval_vcmr import load_serve_opts, resolve_checkpoint
from hero_tpu.evaluation.downstream import validate_videoqa
from hero_tpu.models import videoqa as videoqa_lib
from hero_tpu.utils.logger import LOGGER


def main(args):
    from hero_tpu.parallel.mesh import init_distributed
    init_distributed()
    opts = load_serve_opts(args.output_dir)
    cfg = common.model_config_from_opts(opts)
    params = videoqa_lib.init_hero_for_videoqa(jax.random.PRNGKey(0), cfg)
    ckpt = resolve_checkpoint(args.output_dir, args.checkpoint)
    params = common.load_checkpoint_into(params, ckpt,
                                         cfg.f_config.vocab_size)

    shapes = common.shapes_from_opts(opts)
    video_db = common.load_video_sub_dataset(opts, shapes)
    qdb = QueryTokStore(args.query_txt_db or opts.val_query_txt_db,
                        max_txt_len=opts.max_txt_len)
    A = getattr(opts, "num_answers", 5)
    ds = VideoQaDataset(list(qdb.id2len.keys()), video_db, qdb,
                        qa_len=getattr(opts, "bucket_query_len", 40))

    def batches():
        bs = getattr(opts, "val_batch_size", 8)
        for s in range(0, len(ds), bs):
            idx = list(range(s, min(s + bs, len(ds))))
            b = build_batch(ds, idx, flatten_rows=True)
            b["qids"] = b.pop("__qid__")
            b["targets_host"] = b["targets"]
            yield {k: v for k, v in b.items() if not k.startswith("__")}

    log, results, logits = validate_videoqa(params, cfg, batches(),
                                            num_answers=A)
    LOGGER.info("videoQA eval: %s", log)
    out = os.path.join(args.output_dir,
                       f"qa_results_{args.checkpoint}_all.json")
    with open(out, "w") as f:
        json.dump({str(k): v for k, v in results.items()}, f)
    if args.save_logits:
        with open(out.replace(".json", "_logits.pkl"), "wb") as f:
            pickle.dump(logits, f)
    print(json.dumps(log))
    return log, results


def build_argparser():
    p = argparse.ArgumentParser("hero_tpu eval_videoqa")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--query_txt_db", default=None)
    p.add_argument("--save_logits", action="store_true")
    return p


if __name__ == "__main__":
    main(build_argparser().parse_args())
