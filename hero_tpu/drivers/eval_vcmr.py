"""Standalone full-corpus VCMR inference (reference ``eval_vcmr.py``).

``python -m hero_tpu.drivers.eval_vcmr --output_dir <train_dir>
--checkpoint <step|path> --query_txt_db <db> [--split val]`` — like the
reference, the train-time ``hps.json`` is reloaded as the serve config
(eval_vcmr.py:56-58) and results are written as
``results_{ckpt}_{split}_all.json``.
"""

from __future__ import annotations

import argparse
import json
import os

import jax

from hero_tpu.data.store import QueryTokStore
from hero_tpu.drivers import common
from hero_tpu.drivers.train_vcmr import build_eval_inputs
from hero_tpu.evaluation.vcmr_eval import validate_full_vcmr
from hero_tpu.models import pretrain as pretrain_lib
from hero_tpu.utils.logger import LOGGER
from hero_tpu.utils.misc import Struct


def load_serve_opts(output_dir: str, **overrides):
    with open(os.path.join(output_dir, "log", "hps.json")) as f:
        hps = json.load(f)
    hps.update(overrides)
    return Struct(hps)


def resolve_checkpoint(output_dir: str, checkpoint: str) -> str:
    if os.path.exists(checkpoint):
        return checkpoint
    return os.path.join(output_dir, "ckpt",
                        f"model_step_{checkpoint}.npz")


def main(args, *, query_store_cls=QueryTokStore, full_eval_tasks=None):
    """``query_store_cls``/``full_eval_tasks`` parameterize the VR-only
    variant (reference eval_vr.py restricts the pipeline to VR with
    MsrvttQueryTokLmdb, eval_vr.py:69) without monkey-patching."""
    from hero_tpu.parallel.mesh import init_distributed
    init_distributed()
    opts = load_serve_opts(args.output_dir)
    if args.nms_thd is not None:
        opts.nms_thd = args.nms_thd
    if full_eval_tasks is not None:
        opts.full_eval_tasks = list(full_eval_tasks)
    cfg = common.model_config_from_opts(opts)
    vsm = common.vsm_config_from_opts(opts)
    params = pretrain_lib.init_hero_for_pretraining(
        jax.random.PRNGKey(0), cfg, vsm)
    ckpt = resolve_checkpoint(args.output_dir, args.checkpoint)
    params = common.load_checkpoint_into(params, ckpt,
                                         cfg.f_config.vocab_size)

    shapes = common.shapes_from_opts(opts).replace(n_queries=1)
    video_db = common.load_video_sub_dataset(opts, shapes)
    qdb_path = args.query_txt_db or getattr(opts, "val_query_txt_db")
    query_db = query_store_cls(qdb_path, max_txt_len=opts.max_txt_len)

    vb, qb, video_ids, v2i, qdata = build_eval_inputs(video_db, query_db,
                                                      opts)
    # multi-chip host: shard the corpus tensor over the local mesh so
    # phase-2 scoring runs sharded (no-op on a single device)
    from hero_tpu.parallel.mesh import get_mesh
    mesh = get_mesh() if len(jax.devices()) > 1 else None
    val_log, submission, metrics = validate_full_vcmr(
        params, cfg, vsm, common.eval_opts_from(opts), vb, qb, video_ids,
        v2i, qdata, mesh=mesh)
    tag = os.path.basename(ckpt).replace("model_step_", "").replace(
        ".npz", "").replace(".pt", "")
    out_path = os.path.join(args.output_dir,
                            f"results_{tag}_{args.split}_all.json")
    from hero_tpu.parallel.mesh import is_primary
    if is_primary():    # submission is globally merged; one writer
        with open(out_path, "w") as f:
            json.dump(submission, f)
        LOGGER.info("wrote %s", out_path)
        if metrics:
            print(json.dumps(metrics, indent=2, default=float))
    return metrics, submission


def build_argparser():
    p = argparse.ArgumentParser("hero_tpu eval_vcmr")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--query_txt_db", default=None)
    p.add_argument("--split", default="val")
    p.add_argument("--nms_thd", default=None, type=float)
    return p


if __name__ == "__main__":
    main(build_argparser().parse_args())
