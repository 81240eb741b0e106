"""Published-checkpoint reproduction path (VERDICT r4 missing #2).

Two pins so the convert→eval→metrics flow works the day a released
``hero-tv-ht100.pt`` is present (BASELINE.md north star; network egress
prevents fetching it here):

1. **Schema-level converter coverage**: the torch reference
   ``HeroForPretraining.state_dict()`` — the released checkpoint's exact
   key family set (reference model/model.py:348-364,
   modeling_utils.py:68-121) — converts with zero unexpected keys AND
   covers every leaf of our ``init_hero_for_pretraining`` tree, so key
   drift on either side fails loudly before a checkpoint ever arrives.
2. **End-to-end tool run**: ``tools/reproduce_reference.py`` on a
   synthetically-saved torch reference checkpoint over the synthetic
   corpus → reference-schema results JSON + metric table.
"""

import json
import os
import sys

import numpy as np
import pytest

import jax

from hero_tpu.data.testing import build_synthetic_corpus

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

MAX_FRAMES = 16
VFEAT = 64

TINY = {
    "attention_probs_dropout_prob": 0.1,
    "hidden_act": "gelu",
    "hidden_dropout_prob": 0.1,
    "hidden_size": 32,
    "initializer_range": 0.02,
    "intermediate_size": 128,
    "max_position_embeddings": 64,
    "num_attention_heads": 4,
    "num_hidden_layers": 2,
    "type_vocab_size": 2,
    "vocab_size": 128,
    "layer_norm_eps": 1e-5,
}


@pytest.fixture(scope="module")
def ref_ckpt(tmp_path_factory):
    """Tiny torch reference HeroForPretraining saved as a .pt — the same
    key families as the released hero-tv-ht100.pt."""
    torch = pytest.importorskip("torch")
    import types

    apex = types.ModuleType("apex")
    apex_norm = types.ModuleType("apex.normalization")
    apex_fln = types.ModuleType("apex.normalization.fused_layer_norm")
    apex_fln.FusedLayerNorm = torch.nn.LayerNorm
    apex_norm.fused_layer_norm = apex_fln
    apex.normalization = apex_norm
    sys.modules.setdefault("apex", apex)
    sys.modules.setdefault("apex.normalization", apex_norm)
    sys.modules.setdefault("apex.normalization.fused_layer_norm", apex_fln)
    hvd_mod = types.ModuleType("horovod")
    hvd_torch = types.ModuleType("horovod.torch")
    hvd_torch.size = lambda: 1
    hvd_torch.rank = lambda: 0
    hvd_torch.allgather = lambda t, *a, **k: t
    sys.modules.setdefault("horovod", hvd_mod)
    sys.modules.setdefault("horovod.torch", hvd_torch)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import model.model as ref_model
    import model.pretrain as ref_pretrain

    root = tmp_path_factory.mktemp("ref_ckpt")
    cfg_path = root / "tiny_ref.json"
    cfg_path.write_text(json.dumps({
        "f_config": dict(TINY),
        "c_config": dict(TINY, num_hidden_layers=1),
        "q_config": dict(TINY, num_hidden_layers=0, type_vocab_size=1),
    }))
    torch.manual_seed(0)
    tmodel = ref_pretrain.HeroForPretraining(
        ref_model.VideoModelConfig(str(cfg_path)),
        vfeat_dim=VFEAT, max_frm_seq_len=MAX_FRAMES,
        lw_neg_ctx=1.0, lw_neg_q=1.0, lw_st_ed=0.01, drop_svmr_prob=0)
    pt_path = str(root / "tiny_hero.pt")
    torch.save(tmodel.state_dict(), pt_path)
    return pt_path, str(cfg_path)


def _leaf_paths(tree, prefix=""):
    out = []
    for k, v in tree.items():
        if k.startswith("__"):
            continue
        p = f"{prefix}{k}"
        if isinstance(v, dict):
            out.extend(_leaf_paths(v, p + "/"))
        else:
            out.append(p)
    return out


def test_converter_covers_released_key_families(ref_ckpt):
    """Converted reference state_dict ≡ our init tree, leaf-path-exact in
    BOTH directions (no unexpected reference keys, no init leaf left
    uncovered) — the key-drift tripwire for the released checkpoint."""
    pt_path, cfg_path = ref_ckpt
    import torch

    from hero_tpu.config.model_config import HeroConfig
    from hero_tpu.convert.torch_checkpoint import (convert_state_dict,
                                                   infer_max_frm_seq_len)
    from hero_tpu.models import pretrain as pretrain_lib
    from hero_tpu.models.pretrain import VsmConfig

    sd = torch.load(pt_path, map_location="cpu", weights_only=False)
    assert infer_max_frm_seq_len(sd) == MAX_FRAMES
    tree = convert_state_dict(sd, vocab_size=128)
    assert "__unexpected__" not in tree, tree.get("__unexpected__")

    with open(cfg_path) as f:
        # the reference hardwires max_clip_len=100 (HierarchicalVlModel
        # default, model/model.py:118-119) so the released fom_output head
        # is (hidden, 100); match it for the shape comparison
        cfg = HeroConfig.from_dict(json.load(f), vfeat_dim=VFEAT,
                                   max_frm_seq_len=MAX_FRAMES,
                                   max_clip_len=100)
    init = pretrain_lib.init_hero_for_pretraining(
        jax.random.PRNGKey(0), cfg, VsmConfig(lw_neg_ctx=1.0, lw_neg_q=1.0))
    got, want = set(_leaf_paths(tree)), set(_leaf_paths(init))
    assert got - want == set(), f"converter emits unknown leaves: "\
        f"{sorted(got - want)[:10]}"
    assert want - got == set(), f"init leaves NOT covered by the "\
        f"released checkpoint's key families: {sorted(want - got)[:10]}"
    # shapes agree leaf-by-leaf (so merge_params never silently keeps init)
    import numpy as _np

    def _shapes(t, prefix=""):
        for k, v in t.items():
            if k.startswith("__"):
                continue
            if isinstance(v, dict):
                yield from _shapes(v, f"{prefix}{k}/")
            else:
                yield f"{prefix}{k}", _np.shape(v)
    init_shapes = dict(_shapes(init))
    for path, shape in _shapes(tree):
        assert init_shapes[path] == shape, (path, shape, init_shapes[path])


def test_reproduce_reference_tool_end_to_end(ref_ckpt, tmp_path):
    """tools/reproduce_reference.py: synthetic .pt → convert → two-phase
    corpus eval → reference-schema results + metric table."""
    pt_path, cfg_path = ref_ckpt
    import reproduce_reference as rr

    root = str(tmp_path / "corpus")
    corpus = build_synthetic_corpus(root, n_videos=6,
                                    max_frames=MAX_FRAMES, vfeat_dim=VFEAT)
    # the model json for OUR side: same dims + the video extras
    mc = tmp_path / "tiny_model.json"
    mc.write_text(json.dumps({
        "f_config": dict(TINY),
        "c_config": dict(TINY, num_hidden_layers=1),
        "q_config": dict(TINY, num_hidden_layers=0, type_vocab_size=1),
        "max_frm_seq_len": MAX_FRAMES,
    }))
    out_dir = str(tmp_path / "repro_out")
    overrides = {
        "max_txt_len": 12, "vcmr_eval_video_batch_size": 3,
        "vcmr_eval_batch_size": 6, "max_vcmr_video": 6,
        "bucket_n_subs": 4, "bucket_frames_per_sub": 12,
        "bucket_query_len": 24, "distributed_eval": False,
    }
    args = rr.build_argparser().parse_args([
        "--checkpoint", pt_path,
        "--sub_txt_db", corpus["sub"],
        "--vfeat_db", corpus["vfeat"],
        "--query_txt_db", corpus["query"],
        "--output_dir", out_dir,
        "--model_config", str(mc),
        "--vfeat_dim", str(VFEAT),
        "--max_clip_len", str(MAX_FRAMES),
        "--batch_overrides", json.dumps(overrides),
    ])
    metrics, submission = rr.main(args)
    # reference submission schema (eval_vcmr.py:125-140)
    assert "video2idx" in submission
    assert any(t in submission for t in ("VCMR", "SVMR", "VR"))
    res = [f for f in os.listdir(out_dir) if f.startswith("results_")]
    met = [f for f in os.listdir(out_dir) if f.startswith("metrics_")]
    assert res and met
    assert metrics and "VCMR" in metrics
    table = rr.format_table(metrics)
    assert "R@1" in table and "[VCMR]" in table
