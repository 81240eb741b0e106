"""The shipped experiment-config tier (repo-root ``config/``).

The reference ships 13 run configs (``/root/reference/config/*.json``,
registry at config/config.py:24-348) that make every recipe a one-liner.
This suite pins that hero_tpu's counterparts actually drive their
drivers: each shipped JSON is loaded, its db/path fields are repointed at
the synthetic corpus (hyperparameters scaled down for CI), and the full
driver runs end-to-end.  Plus parse-level pins: every config parses
through its real parser, and CLI flags beat JSON values
(reference config/config.py:11-21 parse_with_config semantics).
"""

import json
import os

import pytest

from hero_tpu.config import opts as opts_lib
from hero_tpu.data.testing import build_synthetic_corpus

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "config")
MAX_FRAMES = 16

TINY_MODEL = {
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

ALL_CONFIGS = [
    "pretrain-tv.json", "pretrain-tv-ht100.json", "train-tvr.json",
    "train-didemo_video_sub.json", "train-didemo_video_only.json",
    "train-msrvtt_video_sub.json", "train-msrvtt_video_only.json",
    "train-tvqa.json", "train-violin.json", "train-tvc.json",
]

PARSERS = {
    "pretrain-tv.json": opts_lib.get_pretrain_args,
    "pretrain-tv-ht100.json": opts_lib.get_pretrain_args,
    "train-tvr.json": opts_lib.get_vcmr_args,
    "train-didemo_video_sub.json": opts_lib.get_vcmr_args,
    "train-didemo_video_only.json": opts_lib.get_vcmr_args,
    "train-msrvtt_video_sub.json": opts_lib.get_vr_args,
    "train-msrvtt_video_only.json": opts_lib.get_vr_args,
    "train-tvqa.json": opts_lib.get_videoqa_args,
    "train-violin.json": opts_lib.get_violin_args,
    "train-tvc.json": opts_lib.get_tvc_args,
}


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cfg_tier"))
    corpus = build_synthetic_corpus(root, n_videos=6,
                                    max_frames=MAX_FRAMES, vfeat_dim=64)
    mc = os.path.join(root, "tiny_model.json")
    with open(mc, "w") as f:
        json.dump(TINY_MODEL, f)
    return root, corpus, mc


def _scaled(cfg, corpus, mc, out_dir):
    """Repoint a shipped config's path fields at the synthetic corpus and
    scale the run down; every hyperparameter KEY stays the shipped one."""
    cfg = dict(cfg)
    cfg.update(model_config=mc, checkpoint=None, output_dir=out_dir,
               max_clip_len=MAX_FRAMES, max_txt_len=12, vfeat_dim=64,
               vfeat_interval=1.5, train_batch_size=2, val_batch_size=2,
               gradient_accumulation_steps=1, num_train_steps=2,
               valid_steps=2, save_steps=2, warmup_steps=1,
               distributed_eval=False,
               bucket_n_subs=4, bucket_frames_per_sub=12,
               bucket_query_len=24, bucket_max_masked=4)
    if cfg.get("sub_txt_db"):
        cfg["sub_txt_db"] = corpus["sub"]
    if cfg.get("vfeat_db"):
        cfg["vfeat_db"] = corpus["vfeat"]
    if "targets" in cfg:
        # multi-target pretrain: each target gets the synthetic dbs,
        # preserving the shipped schema (vfeat_db vs vfeat_shards)
        cfg["pack_subs"] = False    # tiny bucket; packing smoke is in
        # test_drivers_all — here we pin that the SHIPPED keys drive
        for tgt in cfg["targets"]:
            tgt["sub_txt_db"] = corpus["sub"]
            if "vfeat_shards" in tgt:
                tgt["vfeat_shards"] = [corpus["vfeat"]]
            else:
                tgt["vfeat_db"] = corpus["vfeat"]
        cfg["query_per_video"] = 2
        cfg["hard_negtiave_start_step"] = [1]
        cfg["hard_pool_size"] = [4]
    task = cfg.get("task", "")
    if task in ("tvqa", "how2qa"):
        cfg.update(train_query_txt_db=corpus["qa_query"],
                   val_query_txt_db=corpus["qa_query"], num_answers=3)
    elif task == "violin":
        cfg.update(train_query_txt_db=corpus["violin_query"],
                   val_query_txt_db=corpus["violin_query"])
    elif task == "tvc":
        cfg.update(cap_db=corpus["cap"], max_gen_step=5)
    elif task:  # vcmr/vr families
        qdb = corpus["query"]
        cfg.update(train_query_txt_db=qdb, val_query_txt_db=qdb,
                   max_vcmr_video=6, vcmr_eval_video_batch_size=3,
                   vcmr_eval_batch_size=6,
                   hard_negtiave_start_step=[1], hard_pool_size=[4])
    return cfg


def test_all_reference_recipes_shipped():
    """Every reference recipe family has a shipped hero_tpu config, plus
    the three model configs (reference config/hero_*.json)."""
    shipped = set(os.listdir(CONFIG_DIR))
    assert set(ALL_CONFIGS) <= shipped
    assert {"hero_pretrain.json", "hero_finetune.json",
            "hero_tvc.json"} <= shipped


def test_model_configs_load_verbatim():
    """The shipped hero_*.json model configs parse through HeroConfig
    exactly like the reference's (reference model/model.py VideoModelConfig
    consumption of config/hero_pretrain.json)."""
    from hero_tpu.config.model_config import HeroConfig
    pre = HeroConfig.from_json(os.path.join(CONFIG_DIR,
                                            "hero_pretrain.json"))
    assert pre.f_config.num_hidden_layers == 6
    assert pre.f_config.vocab_size == 50265
    assert pre.c_config.num_hidden_layers == 3
    assert pre.q_config.num_hidden_layers == 0
    fin = HeroConfig.from_json(os.path.join(CONFIG_DIR,
                                            "hero_finetune.json"))
    assert fin.f_config.vocab_size == 50272  # padded (50265 -> 8-mult)
    tvc = HeroConfig.from_json(os.path.join(CONFIG_DIR, "hero_tvc.json"))
    assert tvc.d_config is not None
    assert tvc.d_config.num_hidden_layers == 2
    assert tvc.d_config.max_position_embeddings == 1024


@pytest.mark.parametrize("name", ALL_CONFIGS)
def test_config_parses(name):
    """Each shipped config round-trips through its driver's real parser;
    key hyperparameters land as attributes."""
    path = os.path.join(CONFIG_DIR, name)
    with open(path) as f:
        raw = json.load(f)
    opts = PARSERS[name](["--config", path])
    for key in ("learning_rate", "num_train_steps", "train_batch_size",
                "warmup_steps", "seed"):
        assert getattr(opts, key) == raw[key], key
    assert opts.model_config == raw["model_config"]


def test_cli_beats_json():
    """parse_with_config precedence: explicitly-passed CLI flags win over
    JSON values (reference config/config.py:11-21)."""
    path = os.path.join(CONFIG_DIR, "train-tvr.json")
    with open(path) as f:
        raw = json.load(f)
    assert raw["learning_rate"] != 5e-4
    opts = opts_lib.get_vcmr_args(
        ["--config", path, "--learning_rate", "5e-4"])
    assert opts.learning_rate == 5e-4                 # CLI wins
    assert opts.num_train_steps == raw["num_train_steps"]  # JSON fills


@pytest.mark.parametrize("name", ALL_CONFIGS)
def test_recipe_runs_on_synthetic_corpus(name, env, tmp_path):
    """The shipped recipe drives its driver end-to-end (paths repointed
    at the synthetic corpus, sizes scaled for CI)."""
    root, corpus, mc = env
    with open(os.path.join(CONFIG_DIR, name)) as f:
        raw = json.load(f)
    out_dir = str(tmp_path / "out")
    cfg = _scaled(raw, corpus, mc, out_dir)
    cfg_path = str(tmp_path / name)
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    opts = PARSERS[name](["--config", cfg_path])

    if name.startswith("pretrain"):
        from hero_tpu.drivers import pretrain as drv
        drv.main(opts)
    elif "msrvtt" in name:
        from hero_tpu.drivers import train_vr as drv
        drv.main(opts)
    elif cfg["task"] in ("tvqa", "how2qa"):
        from hero_tpu.drivers import train_videoqa as drv
        drv.main(opts)
    elif cfg["task"] == "violin":
        from hero_tpu.drivers import train_violin as drv
        drv.main(opts)
    elif cfg["task"] == "tvc":
        from hero_tpu.drivers import train_tvc as drv
        drv.main(opts)
    else:
        from hero_tpu.drivers import train_vcmr as drv
        drv.main(opts)
    assert os.path.exists(os.path.join(out_dir, "restore.npz"))
