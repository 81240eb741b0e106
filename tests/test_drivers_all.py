"""Smoke tests for every remaining driver on the synthetic corpus."""

import json
import os

import pytest

from hero_tpu.config import opts as opts_lib
from hero_tpu.data.testing import build_synthetic_corpus

MAX_FRAMES = 16

MODEL_CFG = {
    "f_config": {"hidden_size": 32, "num_hidden_layers": 1,
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
    "d_config": {"hidden_size": 32, "num_hidden_layers": 1,
                 "num_attention_heads": 4, "intermediate_size": 64,
                 "max_position_embeddings": 64, "vocab_size": 128,
                 "type_vocab_size": 1},
}


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("drv"))
    corpus = build_synthetic_corpus(root, n_videos=6,
                                    max_frames=MAX_FRAMES, vfeat_dim=64)
    mc = os.path.join(root, "model.json")
    with open(mc, "w") as f:
        json.dump(MODEL_CFG, f)
    base = {
        "sub_txt_db": corpus["sub"],
        "vfeat_db": corpus["vfeat"],
        "model_config": mc,
        "checkpoint": None,
        "max_clip_len": MAX_FRAMES,
        "max_txt_len": 12,
        "vfeat_interval": 1.5,
        "vfeat_dim": 64,
        "train_batch_size": 2,
        "val_batch_size": 2,
        "gradient_accumulation_steps": 1,
        "learning_rate": 1e-3,
        "valid_steps": 4,
        "save_steps": 4,
        "num_train_steps": 4,
        "warmup_steps": 1,
        "grad_norm": 1.0,
        "sub_ctx_len": 0,
        "seed": 3,
        "bucket_n_subs": 4,
        "bucket_frames_per_sub": 12,
        "bucket_query_len": 24,
        "bucket_max_masked": 4,
    }
    return root, corpus, base


def _write_cfg(root, name, d):
    p = os.path.join(root, name)
    with open(p, "w") as f:
        json.dump(d, f)
    return p


def test_pretrain_driver(env):
    root, corpus, base = env
    cfg = dict(base, output_dir=os.path.join(root, "pretrain_out"),
               lw_neg_q=1.0, lw_neg_ctx=1.0, lw_st_ed=0.01,
               query_per_video=2,
               hard_negtiave_start_step=[2], hard_pool_size=[4],
               hard_neg_weights=[10])
    path = _write_cfg(root, "pretrain.json", cfg)
    opts = opts_lib.get_pretrain_args(["--config", path])
    from hero_tpu.drivers import pretrain as drv
    drv.main(opts)
    assert os.path.exists(os.path.join(cfg["output_dir"], "restore.npz"))
    # pretrained ckpt becomes the finetune init
    ckpts = os.listdir(os.path.join(cfg["output_dir"], "ckpt"))
    assert ckpts


def test_pretrain_driver_pipeline_parallel(env, tmp_path_factory):
    """--pp_stages 2 end-to-end: the 2-layer f-encoder pipelines over a
    (data=4, stage=2) mesh through the real driver — training steps,
    validation under the pipeline toggle, checkpointing."""
    root, corpus, base = env
    root2 = str(tmp_path_factory.mktemp("pp_drv"))
    mc2 = dict(MODEL_CFG,
               f_config=dict(MODEL_CFG["f_config"], num_hidden_layers=2))
    mcp = os.path.join(root2, "model_pp.json")
    with open(mcp, "w") as f:
        json.dump(mc2, f)
    cfg = dict(base, model_config=mcp,
               output_dir=os.path.join(root2, "pretrain_pp_out"),
               train_batch_size=8, val_batch_size=8,
               lw_neg_q=1.0, lw_neg_ctx=1.0, lw_st_ed=0.01,
               query_per_video=2,
               hard_negtiave_start_step=[2], hard_pool_size=[4],
               hard_neg_weights=[10])
    path = _write_cfg(root2, "pretrain_pp.json", cfg)
    opts = opts_lib.get_pretrain_args(
        ["--config", path, "--pp_stages", "2", "--pp_microbatches", "2"])
    from hero_tpu.drivers import pretrain as drv
    from hero_tpu.parallel import pipeline as pp
    try:
        drv.main(opts)
        assert pp.n_stages() == 2  # driver really enabled the pipeline
    finally:
        pp.enable_pipeline(None)
    assert os.path.exists(os.path.join(cfg["output_dir"], "restore.npz"))
    assert os.listdir(os.path.join(cfg["output_dir"], "ckpt"))


def test_pretrain_driver_pack_subs(env, tmp_path_factory):
    """--pack_subs end-to-end: the packed data layer (segment ids,
    per-segment positions, MLM placement map) drives every pretrain task
    + validation through the real driver; the seg-mask attention path
    must tolerate every batch shape the encoders see (CLAUDE.md toggle
    rule — e2e, not just units)."""
    root, corpus, base = env
    root2 = str(tmp_path_factory.mktemp("pack_drv"))
    cfg = dict(base, output_dir=os.path.join(root2, "pretrain_pack_out"),
               lw_neg_q=1.0, lw_neg_ctx=1.0, lw_st_ed=0.01,
               query_per_video=2,
               hard_negtiave_start_step=[2], hard_pool_size=[4],
               hard_neg_weights=[10],
               bucket_n_subs=2, bucket_txt_len=32,
               bucket_frames_per_sub=16, bucket_max_masked=8)
    path = _write_cfg(root2, "pretrain_pack.json", cfg)
    opts = opts_lib.get_pretrain_args(["--config", path, "--pack_subs"])
    from hero_tpu.drivers import pretrain as drv
    drv.main(opts)
    assert os.path.exists(os.path.join(cfg["output_dir"], "restore.npz"))
    assert os.listdir(os.path.join(cfg["output_dir"], "ckpt"))


def test_videoqa_driver_and_eval(env):
    root, corpus, base = env
    cfg = dict(base, output_dir=os.path.join(root, "qa_out"),
               train_query_txt_db=corpus["qa_query"],
               val_query_txt_db=corpus["qa_query"],
               num_answers=3, lw_st_ed=0.4, task="tvqa")
    path = _write_cfg(root, "qa.json", cfg)
    opts = opts_lib.get_videoqa_args(["--config", path])
    from hero_tpu.drivers import train_videoqa as drv
    drv.main(opts)

    from hero_tpu.drivers import eval_videoqa
    args = eval_videoqa.build_argparser().parse_args(
        ["--output_dir", cfg["output_dir"], "--checkpoint", "4"])
    log, results = eval_videoqa.main(args)
    assert log["n_ex"] == 6 and "acc" in log
    assert os.path.exists(os.path.join(cfg["output_dir"],
                                       "qa_results_4_all.json"))


def test_videoqa_driver_pack_subs(env, tmp_path_factory):
    """--pack_subs through VideoQA train + eval: QA tokens are replicated
    into each packed segment (video_item append_ids), and the eval driver
    reloads pack_subs from hps.json so serve batches match."""
    root, corpus, base = env
    root2 = str(tmp_path_factory.mktemp("qa_pack"))
    cfg = dict(base, output_dir=os.path.join(root2, "qa_pack_out"),
               train_query_txt_db=corpus["qa_query"],
               val_query_txt_db=corpus["qa_query"],
               num_answers=3, lw_st_ed=0.4, task="tvqa",
               bucket_n_subs=2, bucket_txt_len=40,
               bucket_frames_per_sub=16)
    path = _write_cfg(root2, "qa_pack.json", cfg)
    opts = opts_lib.get_videoqa_args(["--config", path, "--pack_subs"])
    from hero_tpu.drivers import train_videoqa as drv
    drv.main(opts)

    from hero_tpu.drivers import eval_videoqa
    args = eval_videoqa.build_argparser().parse_args(
        ["--output_dir", cfg["output_dir"], "--checkpoint", "4"])
    log, results = eval_videoqa.main(args)
    assert log["n_ex"] == 6 and "acc" in log


def test_violin_driver_pack_subs(env, tmp_path_factory):
    """--pack_subs through VIOLIN train + eval (statement tokens
    replicated per packed segment)."""
    root, corpus, base = env
    root2 = str(tmp_path_factory.mktemp("vl_pack"))
    cfg = dict(base, output_dir=os.path.join(root2, "violin_pack_out"),
               train_query_txt_db=corpus["violin_query"],
               val_query_txt_db=corpus["violin_query"], task="violin",
               bucket_n_subs=2, bucket_txt_len=40,
               bucket_frames_per_sub=16)
    path = _write_cfg(root2, "violin_pack.json", cfg)
    opts = opts_lib.get_violin_args(["--config", path, "--pack_subs"])
    from hero_tpu.drivers import train_violin as drv
    drv.main(opts)

    from hero_tpu.drivers import eval_violin
    args = eval_violin.build_argparser().parse_args(
        ["--output_dir", cfg["output_dir"], "--checkpoint", "4"])
    log, results = eval_violin.main(args)
    assert log["n_ex"] == 12 and "acc" in log


def test_violin_driver_and_eval(env):
    root, corpus, base = env
    cfg = dict(base, output_dir=os.path.join(root, "violin_out"),
               train_query_txt_db=corpus["violin_query"],
               val_query_txt_db=corpus["violin_query"], task="violin")
    path = _write_cfg(root, "violin.json", cfg)
    opts = opts_lib.get_violin_args(["--config", path])
    from hero_tpu.drivers import train_violin as drv
    drv.main(opts)

    from hero_tpu.drivers import eval_violin
    args = eval_violin.build_argparser().parse_args(
        ["--output_dir", cfg["output_dir"], "--checkpoint", "4"])
    log, results = eval_violin.main(args)
    assert log["n_ex"] == 12 and "acc" in log


def test_tvc_driver_pack_subs(env, tmp_path_factory):
    """--pack_subs through TVC training + decode: TVC only ADDS
    caption/clip keys to video items (never rewrites sub rows), so the
    packed f-encoder layout must drive the captioning path end-to-end
    (the decoder consumes frame-level outputs, which packing leaves
    unchanged)."""
    root, corpus, base = env
    root2 = str(tmp_path_factory.mktemp("tvc_pack"))
    cfg = dict(base, output_dir=os.path.join(root2, "tvc_pack_out"),
               cap_db=corpus["cap"], task="tvc", lsr=0.1, max_gen_step=5,
               bucket_n_subs=2, bucket_txt_len=32,
               bucket_frames_per_sub=16)
    path = _write_cfg(root2, "tvc_pack.json", cfg)
    opts = opts_lib.get_tvc_args(["--config", path, "--pack_subs"])
    from hero_tpu.drivers import train_tvc as drv
    drv.main(opts)
    gen = [f for f in os.listdir(cfg["output_dir"])
           if f.startswith("tvc_gen_")]
    assert gen


def test_tvc_driver_caption_only_db(env, tmp_path_factory):
    """Caption DB WITHOUT clip.db: validate() must take the token-level
    generate_captions/score_token_captions branch (regression: the branch
    referenced params_to_device without importing it → NameError at the
    first validation step)."""
    import shutil
    root, corpus, base = env
    root2 = str(tmp_path_factory.mktemp("tvc_noclip"))
    cap2 = os.path.join(root2, "cap_db_root")
    shutil.copytree(corpus["cap"], cap2,
                    ignore=shutil.ignore_patterns("clip.db"))
    assert not os.path.exists(os.path.join(cap2, "clip.db"))
    cfg = dict(base, output_dir=os.path.join(root2, "tvc_noclip_out"),
               cap_db=cap2, task="tvc", lsr=0.1, max_gen_step=5)
    path = _write_cfg(root2, "tvc_noclip.json", cfg)
    opts = opts_lib.get_tvc_args(["--config", path])
    from hero_tpu.drivers import train_tvc as drv
    drv.main(opts)
    gen = [f for f in os.listdir(cfg["output_dir"])
           if f.startswith("tvc_gen_")]
    assert gen


def test_tvc_driver_and_inf(env):
    root, corpus, base = env
    cfg = dict(base, output_dir=os.path.join(root, "tvc_out"),
               cap_db=corpus["cap"], task="tvc", lsr=0.1,
               max_gen_step=5)
    path = _write_cfg(root, "tvc.json", cfg)
    opts = opts_lib.get_tvc_args(["--config", path])
    from hero_tpu.drivers import train_tvc as drv
    drv.main(opts)
    gen = [f for f in os.listdir(cfg["output_dir"])
           if f.startswith("tvc_gen_")]
    assert gen

    from hero_tpu.drivers import inf_tvc
    sub_path = os.path.join(root, "tvc_sub.jsonl")
    args = inf_tvc.build_argparser().parse_args(
        ["--output_dir", cfg["output_dir"], "--checkpoint", "4",
         "--submission", sub_path])
    inf_tvc.main(args)
    with open(sub_path) as f:
        recs = [json.loads(l) for l in f if l.strip()]
    # reference submission schema + every clip covered exactly once
    assert recs and all(set(r) >= {"vid_name", "clip_id", "ts", "descs"}
                        for r in recs)
    from hero_tpu.data.downstream_tasks import TvcCaptionStore
    cap_db = TvcCaptionStore(corpus["cap"])
    all_clips = sorted(c for cs in cap_db.vid2clips.values() for c in cs)
    assert sorted(str(r["clip_id"]) for r in recs) == all_clips

    # TvcEvalDataset path: generation from a raw, unannotated clip jsonl
    target = os.path.join(root, "target_clips.jsonl")
    with open(target, "w") as f:
        for cid in all_clips[:3]:
            ex = cap_db.get_clip(cid)
            f.write(json.dumps({"vid_name": ex["vid_name"],
                                "clip_id": int(cid),
                                "ts": ex["ts"]}) + "\n")
    sub2 = os.path.join(root, "tvc_sub2.jsonl")
    args = inf_tvc.build_argparser().parse_args(
        ["--output_dir", cfg["output_dir"], "--checkpoint", "4",
         "--target_clip", target, "--submission", sub2])
    inf_tvc.main(args)
    with open(sub2) as f:
        recs2 = [json.loads(l) for l in f if l.strip()]
    assert sorted(str(r["clip_id"]) for r in recs2) == all_clips[:3]


def test_vr_driver(env):
    root, corpus, base = env
    cfg = dict(base, output_dir=os.path.join(root, "vr_out"),
               train_query_txt_db=corpus["query"],
               val_query_txt_db=None,
               lw_neg_q=1.0, lw_neg_ctx=1.0, lw_st_ed=0,
               task="msrvtt_video_sub",
               max_vcmr_video=6, vcmr_eval_video_batch_size=3,
               vcmr_eval_batch_size=6)
    path = _write_cfg(root, "vr.json", cfg)
    opts = opts_lib.get_vr_args(["--config", path])
    from hero_tpu.drivers import train_vr as drv
    drv.main(opts)
    assert os.path.exists(os.path.join(cfg["output_dir"], "restore.npz"))


def test_vr_video_only_driver(env):
    root, corpus, base = env
    cfg = dict(base, output_dir=os.path.join(root, "vr_vonly_out"),
               train_query_txt_db=corpus["query"],
               val_query_txt_db=None,
               sub_txt_db=None,
               lw_neg_q=1.0, lw_neg_ctx=1.0, lw_st_ed=0,
               task="msrvtt_video_only",
               max_vcmr_video=6, vcmr_eval_video_batch_size=3,
               vcmr_eval_batch_size=6)
    path = _write_cfg(root, "vr_vonly.json", cfg)
    opts = opts_lib.get_vr_args(["--config", path])
    from hero_tpu.drivers import train_vr as drv
    drv.main(opts)
    assert os.path.exists(os.path.join(cfg["output_dir"], "restore.npz"))


def test_pretrain_multi_target(env, tmp_path_factory):
    root, corpus, base = env
    root2 = str(tmp_path_factory.mktemp("tgt2"))
    corpus2 = build_synthetic_corpus(root2, n_videos=4,
                                     max_frames=MAX_FRAMES, vfeat_dim=64,
                                     seed=9)
    cfg = dict(base, output_dir=os.path.join(root, "pretrain_mt_out"),
               lw_neg_q=1.0, lw_neg_ctx=1.0, lw_st_ed=0.01,
               query_per_video=2, num_train_steps=4, valid_steps=100,
               targets=[
                   {"name": "tv", "sub_txt_db": corpus["sub"],
                    "vfeat_db": corpus["vfeat"],
                    "tasks": {"mlm": 2, "vsm": 2}},
                   {"name": "ht", "sub_txt_db": corpus2["sub"],
                    "vfeat_shards": [corpus2["vfeat"]],
                    "tasks": {"fom": 1}},
               ],
               targets_ratio=[2, 1])
    path = _write_cfg(root, "pretrain_mt.json", cfg)
    opts = opts_lib.get_pretrain_args(["--config", path])
    from hero_tpu.drivers import pretrain as drv
    drv.main(opts)
    assert os.path.exists(os.path.join(cfg["output_dir"], "restore.npz"))


def test_violin_learning_signal(tmp_path_factory):
    """On the CORRELATED corpus, entailment is a learnable rule (a true
    statement opens with its video's identity token, a false one with
    another video's), so a few dozen driver steps must push eval accuracy
    well above the 50% chance that label-memorization alone sits at after
    this few epochs."""
    root = str(tmp_path_factory.mktemp("vl_sig"))
    corpus = build_synthetic_corpus(root, n_videos=6,
                                    max_frames=MAX_FRAMES, vfeat_dim=64,
                                    correlated=True, seed=5)
    mc = os.path.join(root, "model.json")
    with open(mc, "w") as f:
        json.dump(MODEL_CFG, f)
    n_steps = 60
    cfg = dict(
        sub_txt_db=corpus["sub"], vfeat_db=corpus["vfeat"],
        model_config=mc, checkpoint=None, max_clip_len=MAX_FRAMES,
        max_txt_len=12, vfeat_interval=1.5, vfeat_dim=64,
        train_batch_size=4, val_batch_size=4,
        gradient_accumulation_steps=1, learning_rate=2e-3,
        valid_steps=1000, save_steps=n_steps, num_train_steps=n_steps,
        warmup_steps=5, grad_norm=1.0, sub_ctx_len=0, seed=3,
        bucket_n_subs=4, bucket_frames_per_sub=12, bucket_query_len=24,
        bucket_max_masked=4,
        output_dir=os.path.join(root, "violin_out"),
        train_query_txt_db=corpus["violin_query"],
        val_query_txt_db=corpus["violin_query"], task="violin")
    path = _write_cfg(root, "violin_sig.json", cfg)
    opts = opts_lib.get_violin_args(["--config", path])
    from hero_tpu.drivers import train_violin as drv
    drv.main(opts)

    from hero_tpu.drivers import eval_violin
    args = eval_violin.build_argparser().parse_args(
        ["--output_dir", cfg["output_dir"], "--checkpoint", str(n_steps)])
    log, _ = eval_violin.main(args)
    assert log["n_ex"] == 12
    assert log["acc"] >= 0.75, log


def test_eval_vr_standalone(env):
    root, corpus, base = env
    out = os.path.join(root, "vr_out")
    if not os.path.exists(os.path.join(out, "ckpt")):
        pytest.skip("vr driver test must run first")
    from hero_tpu.drivers import eval_vr, eval_vcmr
    ckpts = sorted(os.listdir(os.path.join(out, "ckpt")))
    step = ckpts[-1].replace("model_step_", "").replace(".npz", "")
    args = eval_vcmr.build_argparser().parse_args(
        ["--output_dir", out, "--checkpoint", step,
         "--query_txt_db", corpus["query"]])
    metrics, submission = eval_vr.main(args)
    assert set(submission) >= {"video2idx", "VR"}
    assert "VCMR" not in submission
    assert metrics and "VR" in metrics
