"""Interrupted-vs-uninterrupted training equivalence (VERDICT item 9).

A pretrain run preempted at step 3 and resumed must produce EXACTLY the
final parameters of the uninterrupted run: TrainingRestorer restores
params/moments/step, and MetaLoader.fast_forward + DatasetIterator.skip
replay the identical task/batch schedule.
"""

import json
import os

import numpy as np
import pytest

from hero_tpu.config import opts as opts_lib
from hero_tpu.data.testing import build_synthetic_corpus

MAX_FRAMES = 16


def _config(root, corpus, out_name):
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
    mc = os.path.join(root, "model.json")
    with open(mc, "w") as f:
        json.dump(model_cfg, f)
    cfg = dict(
        sub_txt_db=corpus["sub"], vfeat_db=corpus["vfeat"],
        model_config=mc, checkpoint=None,
        output_dir=os.path.join(root, out_name),
        max_clip_len=MAX_FRAMES, max_txt_len=12, vfeat_interval=1.5,
        vfeat_dim=64, train_batch_size=4, gradient_accumulation_steps=1,
        learning_rate=1e-3, valid_steps=1000, save_steps=3,
        num_train_steps=6, warmup_steps=2, grad_norm=1.0, sub_ctx_len=0,
        seed=11, bucket_n_subs=4, bucket_frames_per_sub=12,
        bucket_query_len=16, query_per_video=2,
        lw_neg_q=1.0, lw_neg_ctx=1.0, lw_st_ed=0.01,
        hard_pool_size=[4], hard_neg_weights=[10],
        hard_negtiave_start_step=[100], train_span_start_step=0,
        task_ratios={"mlm": 1, "vsm": 2},
    )
    path = os.path.join(root, f"{out_name}.json")
    with open(path, "w") as f:
        json.dump(cfg, f)
    return path, cfg


def _final_params(out_dir, step=6):
    from hero_tpu.training.save import load_params
    return load_params(os.path.join(out_dir, "ckpt",
                                    f"model_step_{step}.npz"))


def test_interrupted_resume_matches_uninterrupted(tmp_path):
    root = str(tmp_path)
    corpus = build_synthetic_corpus(root, n_videos=6,
                                    max_frames=MAX_FRAMES, vfeat_dim=64)
    from hero_tpu.drivers import pretrain as drv
    import hero_tpu.drivers.common as dcommon

    # --- uninterrupted 6-step run
    cfg_a, _ = _config(root, corpus, "full")
    drv.main(opts_lib.get_pretrain_args(["--config", cfg_a]))
    want = _final_params(os.path.join(root, "full"))

    # --- same run preempted at step 3 (hps unchanged), then resumed
    cfg_b, meta = _config(root, corpus, "resumed")
    orig = dcommon.run_training

    def interrupted(opts, *a, **k):
        opts.num_train_steps = 3
        return orig(opts, *a, **k)

    dcommon.run_training = interrupted
    try:
        drv.main(opts_lib.get_pretrain_args(["--config", cfg_b]))
    finally:
        dcommon.run_training = orig
    assert os.path.exists(os.path.join(root, "resumed", "restore.npz"))
    drv.main(opts_lib.get_pretrain_args(["--config", cfg_b]))
    got = _final_params(os.path.join(root, "resumed"))

    import jax
    leaves_w, tree_w = jax.tree.flatten(want)
    leaves_g, tree_g = jax.tree.flatten(got)
    assert tree_w == tree_g
    for a, b in zip(leaves_w, leaves_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
