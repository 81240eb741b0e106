"""Standalone VIOLIN inference (reference ``eval_violin.py``): binary
accuracy from sigmoid > 0.5."""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from hero_tpu.data.downstream_tasks import ViolinDataset, build_batch
from hero_tpu.data.store import QueryTokStore
from hero_tpu.drivers import common
from hero_tpu.drivers.eval_vcmr import load_serve_opts, resolve_checkpoint
from hero_tpu.evaluation.downstream import validate_violin
from hero_tpu.models import violin as violin_lib
from hero_tpu.utils.logger import LOGGER


def main(args):
    from hero_tpu.parallel.mesh import init_distributed
    init_distributed()
    opts = load_serve_opts(args.output_dir)
    cfg = common.model_config_from_opts(opts)
    params = violin_lib.init_hero_for_violin(jax.random.PRNGKey(0), cfg)
    ckpt = resolve_checkpoint(args.output_dir, args.checkpoint)
    params = common.load_checkpoint_into(params, ckpt,
                                         cfg.f_config.vocab_size)

    shapes = common.shapes_from_opts(opts)
    video_db = common.load_video_sub_dataset(opts, shapes)
    qdb = QueryTokStore(args.query_txt_db or opts.val_query_txt_db,
                        max_txt_len=opts.max_txt_len)
    qids = [q for q in qdb.id2len if q.endswith("_0")]
    ds = ViolinDataset(qids, video_db, qdb,
                       stmt_len=getattr(opts, "bucket_query_len", 40))

    def batches():
        bs = getattr(opts, "val_batch_size", 8)
        for s in range(0, len(ds), bs):
            idx = list(range(s, min(s + bs, len(ds))))
            b = build_batch(ds, idx, flatten_rows=True)
            qids_flat = [q for pair in b.pop("__qids__") for q in pair]
            b = {k: v for k, v in b.items() if not k.startswith("__")}
            b["qids"] = qids_flat
            b["targets_host"] = np.asarray(b["targets"]).reshape(-1)
            b["targets"] = b["targets_host"]
            yield b

    log, results = validate_violin(params, cfg, batches())
    LOGGER.info("violin eval: %s", log)
    out = os.path.join(args.output_dir,
                       f"violin_results_{args.checkpoint}_all.json")
    with open(out, "w") as f:
        json.dump({str(k): v for k, v in results.items()}, f)
    print(json.dumps(log))
    return log, results


def build_argparser():
    p = argparse.ArgumentParser("hero_tpu eval_violin")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--query_txt_db", default=None)
    return p


if __name__ == "__main__":
    main(build_argparser().parse_args())
