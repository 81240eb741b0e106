"""End-to-end driver test: train_vcmr on the synthetic corpus (tiny model).

Exercises the full L5 stack: JSON config parse → stores → dataset →
sharded train step with curricula/accumulation → inline full-corpus VCMR
validation → checkpoint + restore artifacts + result-JSON schema.
"""

import json
import os

import numpy as np
import pytest

from hero_tpu.config import opts as opts_lib
from hero_tpu.data.testing import build_synthetic_corpus

MAX_FRAMES = 16


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    corpus = build_synthetic_corpus(root, n_videos=6,
                                    max_frames=MAX_FRAMES, vfeat_dim=64)
    model_cfg = {
        "f_config": {"hidden_size": 32, "num_hidden_layers": 2,
                     "num_attention_heads": 4, "intermediate_size": 64,
                     "max_position_embeddings": 64, "vocab_size": 128,
                     "type_vocab_size": 2},
        "c_config": {"hidden_size": 32, "num_hidden_layers": 1,
                     "num_attention_heads": 4, "intermediate_size": 64,
                     "max_position_embeddings": 64, "type_vocab_size": 2},
        "q_config": {"hidden_size": 32, "num_hidden_layers": 0,
                     "num_attention_heads": 4, "intermediate_size": 64,
                     "max_position_embeddings": 64, "vocab_size": 128,
                     "type_vocab_size": 1},
    }
    mc_path = os.path.join(root, "model.json")
    with open(mc_path, "w") as f:
        json.dump(model_cfg, f)
    exp = {
        "task": "tvr",
        "sub_txt_db": corpus["sub"],
        "vfeat_db": corpus["vfeat"],
        "train_query_txt_db": corpus["query"],
        "val_query_txt_db": corpus["query"],
        "model_config": mc_path,
        "checkpoint": None,
        "output_dir": os.path.join(root, "out"),
        "max_clip_len": MAX_FRAMES,
        "max_txt_len": 12,
        "vfeat_interval": 1.5,
        "vfeat_dim": 64,
        "train_batch_size": 4,
        "gradient_accumulation_steps": 2,
        "learning_rate": 1e-3,
        "valid_steps": 10,
        "save_steps": 5,
        "num_train_steps": 10,
        "warmup_steps": 2,
        "grad_norm": 1.0,
        "lw_neg_q": 8.0,
        "lw_neg_ctx": 8.0,
        "lw_st_ed": 0.02,
        "hard_pool_size": [4],
        "hard_neg_weights": [10],
        "hard_negtiave_start_step": [5],
        "train_span_start_step": 0,
        "sub_ctx_len": 0,
        "seed": 7,
        "max_vcmr_video": 6,
        "max_before_nms": 50,
        "max_after_nms": 20,
        "nms_thd": 0.5,
        "min_pred_l": 1,
        "max_pred_l": 8,
        "vcmr_eval_video_batch_size": 4,
        "vcmr_eval_batch_size": 10,
        "bucket_n_subs": 4,
        "bucket_frames_per_sub": 12,
        "bucket_query_len": 16,
    }
    cfg_path = os.path.join(root, "exp.json")
    with open(cfg_path, "w") as f:
        json.dump(exp, f)
    return root, cfg_path, exp


def test_train_vcmr_driver_end_to_end(env):
    root, cfg_path, exp = env
    opts = opts_lib.get_vcmr_args(["--config", cfg_path])
    assert opts.task == "tvr" and opts.train_batch_size == 4

    from hero_tpu.drivers import train_vcmr
    train_vcmr.main(opts)

    out = exp["output_dir"]
    # training meta + restore + ckpt artifacts
    assert os.path.exists(os.path.join(out, "log", "hps.json"))
    assert os.path.exists(os.path.join(out, "restore.npz"))
    ckpts = os.listdir(os.path.join(out, "ckpt"))
    assert any(c.startswith("model_step_") for c in ckpts)
    # result submission JSON with the reference schema
    results = [f for f in os.listdir(out) if f.startswith("results_")]
    assert results
    with open(os.path.join(out, sorted(results)[-1])) as f:
        sub = json.load(f)
    assert "video2idx" in sub and "VCMR" in sub and "VR" in sub
    preds = sub["VCMR"][0]["predictions"]
    assert preds and len(preds[0]) == 4


def test_restore_resumes(env):
    """Re-running the driver must restore from restore.npz, not restart."""
    root, cfg_path, exp = env
    opts = opts_lib.get_vcmr_args(["--config", cfg_path])
    from hero_tpu.training.save import TrainingRestorer
    restorer = TrainingRestorer(exp["output_dir"],
                                {"num_train_steps": opts.num_train_steps,
                                 "learning_rate": opts.learning_rate})
    assert restorer.can_restore()
    from hero_tpu.training.step import TrainState
    import jax
    from hero_tpu.models import pretrain as pl
    from hero_tpu.drivers import common
    cfg = common.model_config_from_opts(opts)
    params = pl.init_hero_for_pretraining(jax.random.PRNGKey(0), cfg)
    state = restorer.restore(TrainState.create(params))
    assert int(state.global_step) == exp["num_train_steps"]


def test_train_and_eval_vcmr_pack_subs(env, tmp_path_factory):
    """--pack_subs through the downstream train AND serve paths: the
    packed layout must survive the full round trip — train_vcmr (inline
    full-corpus validation included), hps.json carrying pack_subs=True,
    then the standalone eval driver reloading it and rebuilding the
    PACKED video dataset for phase 1 (incl. the zero-pad dummy video in
    the padded tail batch, whose all-zero seg ids are harmless: finite
    activations, force-ranked below every real video)."""
    root, cfg_path, exp = env
    out = str(tmp_path_factory.mktemp("vcmr_pack")) + "/out"
    cfg = dict(exp, output_dir=out, num_train_steps=6, valid_steps=6,
               save_steps=3, gradient_accumulation_steps=1,
               hard_negtiave_start_step=[3],
               bucket_n_subs=2, bucket_txt_len=24,
               bucket_frames_per_sub=16)
    cfg_pack = os.path.join(os.path.dirname(out), "exp_pack.json")
    with open(cfg_pack, "w") as f:
        json.dump(cfg, f)
    opts = opts_lib.get_vcmr_args(["--config", cfg_pack, "--pack_subs",
                                   "--pack_queries"])
    assert opts.pack_subs and opts.pack_queries

    from hero_tpu.drivers import train_vcmr
    train_vcmr.main(opts)
    with open(os.path.join(out, "log", "hps.json")) as f:
        hps = json.load(f)
        assert hps["pack_subs"] is True
        # --pack_queries rides hps.json into the standalone eval below,
        # so its phase 2 runs the packed query encoder too
        assert hps["pack_queries"] is True
    results = [f for f in os.listdir(out) if f.startswith("results_")]
    assert results

    from hero_tpu.drivers import eval_vcmr
    ckpts = sorted(f for f in os.listdir(os.path.join(out, "ckpt")))
    step = ckpts[-1].replace("model_step_", "").replace(".npz", "")
    args = eval_vcmr.build_argparser().parse_args(
        ["--output_dir", out, "--checkpoint", step,
         "--query_txt_db", exp["val_query_txt_db"], "--split", "test"])
    metrics, submission = eval_vcmr.main(args)
    assert metrics and "VCMR" in metrics
    assert all(np.isfinite(v) for v in metrics["VCMR"].values())
    preds = submission["VCMR"][0]["predictions"]
    assert preds and len(preds[0]) == 4


def test_eval_vcmr_standalone(env):
    """Standalone serve-path inference reloading hps.json + ckpt."""
    root, cfg_path, exp = env
    from hero_tpu.drivers import eval_vcmr
    out = exp["output_dir"]
    import os
    ckpts = sorted(f for f in os.listdir(os.path.join(out, "ckpt")))
    step = ckpts[-1].replace("model_step_", "").replace(".npz", "")
    args = eval_vcmr.build_argparser().parse_args(
        ["--output_dir", out, "--checkpoint", step,
         "--query_txt_db", exp["val_query_txt_db"], "--split", "test"])
    metrics, submission = eval_vcmr.main(args)
    assert metrics and "VCMR" in metrics
    assert os.path.exists(os.path.join(
        out, f"results_{step}_test_all.json"))
