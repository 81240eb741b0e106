"""One-command reproduction of the reference's published-checkpoint
numbers (BASELINE.md north star: TVR VCMR R@1/R@10 parity with
``hero-tv-ht100.pt``).

Packages convert → two-phase corpus eval → metric table so it runs the
day a released checkpoint is present::

    python tools/reproduce_reference.py \
        --checkpoint /pretrain/hero-tv-ht100.pt \
        --sub_txt_db /txt/tv_subtitles.db --vfeat_db /video/tv \
        --query_txt_db /txt/tvr_val.db --split val \
        --output_dir /tmp/repro_tvr

mirroring the reference recipe (``/root/reference/README.md:75-95``:
``eval_vcmr.py --query_txt_db /txt/tvr_val.db --split val ...``;
pipeline at ``/root/reference/eval_vcmr.py:45-143``).  Steps:

1. serve opts = the shipped ``config/train-tvr.json`` recipe (or
   ``--config``) with the CLI db paths;
2. ``hero_tpu.convert.torch_checkpoint`` converts the ``.pt``
   (gamma/beta renames, vocab pad 50265→50272, stacked layers) — .npz
   checkpoints load directly;
3. full two-phase VCMR/SVMR/VR eval (``evaluation/vcmr_eval.py``),
   protocol-exact vs the reference standalone evaluator;
4. writes ``results_{tag}_{split}_all.json`` (reference submission
   schema) + ``metrics_{tag}_{split}.json`` and prints the reference's
   R@{1,5,10,100} × IoU{0.5,0.7} table.

The published TVR-val numbers for ``hero-tv-ht100`` (reference README
table) are embedded for the side-by-side column.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# reference README "HERO (TV + HowTo100M pre-training)" TVR-val row —
# printed next to our reproduced numbers for eyeball parity
PUBLISHED_TVR_VAL = {
    "VCMR": {"0.7-r1": 2.98, "0.7-r10": 10.65, "0.7-r100": 18.25},
}

IOU_THDS = (0.5, 0.7)
RECALLS = (1, 5, 10, 100)


def build_argparser():
    p = argparse.ArgumentParser("reproduce the reference checkpoint eval")
    p.add_argument("--checkpoint", required=True,
                   help=".pt (converted on the fly) or .npz")
    p.add_argument("--sub_txt_db", default=None)
    p.add_argument("--vfeat_db", required=True)
    p.add_argument("--query_txt_db", required=True)
    p.add_argument("--split", default="val")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--config",
                   default=os.path.join(os.path.dirname(__file__), "..",
                                        "config", "train-tvr.json"),
                   help="recipe providing eval hyperparameters "
                        "(nms/q2c_alpha/pred-length bands)")
    p.add_argument("--model_config", default=None,
                   help="override the recipe's model_config")
    p.add_argument("--task", default=None,
                   help="override the recipe task (e.g. didemo_video_only)")
    p.add_argument("--nms_thd", default=None, type=float)
    p.add_argument("--vfeat_dim", default=None, type=int)
    p.add_argument("--max_clip_len", default=None, type=int)
    p.add_argument("--batch_overrides", default=None,
                   help="JSON dict merged into the serve opts last (test "
                        "hook / small-corpus sizing)")
    return p


def load_opts(args):
    from hero_tpu.utils.misc import Struct
    with open(args.config) as f:
        opts = json.load(f)
    # config-relative model_config paths resolve against the repo root,
    # where the shipped config/ tier lives
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for k, v in (("sub_txt_db", args.sub_txt_db),
                 ("vfeat_db", args.vfeat_db),
                 ("val_query_txt_db", args.query_txt_db),
                 ("output_dir", args.output_dir),
                 ("checkpoint", args.checkpoint),
                 ("task", args.task),
                 ("model_config", args.model_config),
                 ("nms_thd", args.nms_thd),
                 ("vfeat_dim", args.vfeat_dim),
                 ("max_clip_len", args.max_clip_len)):
        if v is not None:
            opts[k] = v
    if not os.path.isabs(opts["model_config"]):
        opts["model_config"] = os.path.join(repo, opts["model_config"])
    if args.batch_overrides:
        opts.update(json.loads(args.batch_overrides))
    return Struct(opts)


def format_table(metrics: dict) -> str:
    lines = []
    for task, m in metrics.items():
        if not isinstance(m, dict):
            continue
        lines.append(f"[{task}]")
        header = ["IoU"] + [f"R@{r}" for r in RECALLS]
        lines.append("  " + "  ".join(f"{h:>8}" for h in header))
        for iou in IOU_THDS:
            row = [f"{iou:.1f}"]
            for r in RECALLS:
                v = m.get(f"{iou}-r{r}")
                row.append("-" if v is None else f"{v:.2f}")
            lines.append("  " + "  ".join(f"{c:>8}" for c in row))
        pub = PUBLISHED_TVR_VAL.get(task)
        if pub:
            lines.append("  published (hero-tv-ht100, TVR val): "
                         + ", ".join(f"{k}={v}" for k, v in pub.items()))
    return "\n".join(lines)


def main(args):
    from hero_tpu.parallel.mesh import init_distributed, is_primary
    init_distributed()
    opts = load_opts(args)
    os.makedirs(opts.output_dir, exist_ok=True)

    import jax

    from hero_tpu.drivers import common
    from hero_tpu.drivers.train_vcmr import build_eval_inputs
    from hero_tpu.evaluation.vcmr_eval import validate_full_vcmr
    from hero_tpu.models import pretrain as pretrain_lib

    cfg = common.model_config_from_opts(opts)
    vsm = common.vsm_config_from_opts(opts)
    params = pretrain_lib.init_hero_for_pretraining(
        jax.random.PRNGKey(0), cfg, vsm)
    print(f"converting + loading {opts.checkpoint} ...")
    params = common.load_checkpoint_into(params, opts.checkpoint,
                                         cfg.f_config.vocab_size)

    shapes = common.shapes_from_opts(opts).replace(n_queries=1)
    if common.is_video_only_task(getattr(opts, "task", "tvr")):
        opts.train_query_txt_db = args.query_txt_db   # meta source
        video_db = common.load_video_only_dataset(opts, shapes)
    else:
        video_db = common.load_video_sub_dataset(opts, shapes)
    from hero_tpu.data.store import QueryTokStore
    # reference eval loads the query db UNfiltered (QueryTokLmdb(db, -1),
    # eval_vcmr.py:74) so every released query is scored
    query_db = QueryTokStore(args.query_txt_db, max_txt_len=-1)

    vb, qb, video_ids, v2i, qdata = build_eval_inputs(video_db, query_db,
                                                      opts)
    from hero_tpu.parallel.mesh import get_mesh
    mesh = get_mesh() if len(jax.devices()) > 1 else None
    val_log, submission, metrics = validate_full_vcmr(
        params, cfg, vsm, common.eval_opts_from(opts), vb, qb, video_ids,
        v2i, qdata, mesh=mesh)

    tag = os.path.basename(opts.checkpoint)
    for suf in (".pt", ".npz"):
        tag = tag[:-len(suf)] if tag.endswith(suf) else tag
    if is_primary():
        res_path = os.path.join(opts.output_dir,
                                f"results_{tag}_{args.split}_all.json")
        with open(res_path, "w") as f:
            json.dump(submission, f)
        met_path = os.path.join(opts.output_dir,
                                f"metrics_{tag}_{args.split}.json")
        with open(met_path, "w") as f:
            json.dump(metrics, f, indent=2, default=float)
        print(f"wrote {res_path}\nwrote {met_path}")
        if metrics:
            print(format_table(metrics))
        else:
            print("no ground truth in this split — submission only "
                  "(format the results file for the eval server, as the "
                  "reference README instructs)")
    return metrics, submission


if __name__ == "__main__":
    main(build_argparser().parse_args())
