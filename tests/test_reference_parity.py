"""Numerical parity vs the ACTUAL reference implementation.

Imports the reference torch model from /root/reference (apex/horovod
stubbed — apex FusedLayerNorm ≡ torch.nn.LayerNorm in fp32), initializes a
tiny HeroForPretraining, converts its state dict with our converter, builds
equivalent batches (ragged collate-form for the reference, fixed-shape for
us), and requires the outputs to agree.  This pins:

- every embedding convention (positions, types, padding-idx),
- the [frames; text] fused layout vs the reference's gather_index compacting,
- the scatter-add of fused outputs onto the clip timeline,
- the full encoder stacks, query encoder, VSM scoring heads,
- the checkpoint converter's key mapping and transposes.
"""

import json
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# reference import with stubbed native deps
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref():
    import torch

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
    import model.pretrain as ref_pretrain
    import model.model as ref_model
    return ref_pretrain, ref_model


@pytest.fixture(scope="module")
def tiny_json(tmp_path_factory):
    base = {
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
    cfg = {
        "f_config": dict(base),
        "c_config": dict(base, num_hidden_layers=1),
        "q_config": dict(base, num_hidden_layers=0, type_vocab_size=1),
    }
    p = tmp_path_factory.mktemp("cfg") / "tiny.json"
    p.write_text(json.dumps(cfg))
    return str(p)


VFEAT, CLIP_LEN = 64, 10


@pytest.fixture(scope="module")
def models(ref, tiny_json):
    import torch
    ref_pretrain, ref_model = ref
    torch.manual_seed(0)
    tmodel = ref_pretrain.HeroForPretraining(
        ref_model.VideoModelConfig(tiny_json),
        vfeat_dim=VFEAT, max_frm_seq_len=16,
        lw_neg_ctx=1.0, lw_neg_q=1.0, lw_st_ed=0.01, drop_svmr_prob=0)
    tmodel.eval()

    from hero_tpu.config.model_config import HeroConfig
    from hero_tpu.convert.torch_checkpoint import convert_state_dict
    with open(tiny_json) as f:
        jcfg = HeroConfig.from_dict(json.load(f), vfeat_dim=VFEAT,
                                    max_frm_seq_len=16,
                                    max_clip_len=CLIP_LEN)
    params = convert_state_dict(tmodel.state_dict(), vocab_size=128)
    assert "__unexpected__" not in params, params.get("__unexpected__")
    params = jax.tree.map(jnp.asarray, params)
    return tmodel, jcfg, params


def _scenario(seed=0):
    """Ground truth: 2 videos, [2, 3] subs, contiguous frame spans."""
    r = np.random.RandomState(seed)
    num_subs = [2, 3]
    sub_frames = [[[0, 1, 2], [3, 4]],
                  [[0, 1], [2, 3, 4, 5], [6]]]
    txt = [[list(r.randint(3, 128, 5)), list(r.randint(3, 128, 4))],
           [list(r.randint(3, 128, 3)), list(r.randint(3, 128, 6)),
            list(r.randint(3, 128, 4))]]
    c_v_feats = r.randn(2, CLIP_LEN, VFEAT).astype(np.float32)
    c_attn_masks = np.ones((2, CLIP_LEN), np.float32)
    return num_subs, sub_frames, txt, c_v_feats, c_attn_masks


def _ref_batch(num_subs, sub_frames, txt, c_v_feats, c_attn_masks):
    """Replicate the reference collate layout (data/data.py:406-512)."""
    import torch
    rows_ids, rows_feats, rows_masks = [], [], []
    for vi in range(len(num_subs)):
        for si in range(num_subs[vi]):
            ids = txt[vi][si]
            frames = sub_frames[vi][si]
            rows_ids.append(ids)
            rows_feats.append(c_v_feats[vi, frames])
            rows_masks.append([1] * (len(frames) + len(ids)))
    max_tl = max(len(i) for i in rows_ids)
    max_vl = max(f.shape[0] for f in rows_feats)
    out_size = max(len(m) for m in rows_masks)
    N = len(rows_ids)
    f_sub_input_ids = np.full((N, max_tl), 1, np.int64)
    f_attn = np.zeros((N, out_size), np.int64)
    f_v_feats = np.zeros((N, max_vl, VFEAT), np.float32)
    gather = np.tile(np.arange(out_size, dtype=np.int64), (N, 1))
    for i, (ids, feats, m) in enumerate(zip(rows_ids, rows_feats,
                                            rows_masks)):
        f_sub_input_ids[i, :len(ids)] = ids
        f_attn[i, :len(m)] = 1
        nf = feats.shape[0]
        f_v_feats[i, :nf] = feats
        gather[i, nf:len(ids) + nf] = np.arange(max_vl, max_vl + len(ids))
    sub_idx2frame_idx = []
    for vi in range(len(num_subs)):
        sub_idx2frame_idx.append(
            [(si, sub_frames[vi][si]) for si in range(num_subs[vi])])
    t = torch.tensor
    return {
        "f_sub_input_ids": t(f_sub_input_ids),
        "f_sub_pos_ids": t(np.arange(max_tl, dtype=np.int64)[None]),
        "f_v_feats": t(f_v_feats),
        "f_v_pos_ids": t(np.arange(max_vl, dtype=np.int64)[None]),
        "f_attn_masks": t(f_attn),
        "f_gather_index": t(gather),
        "c_v_feats": t(c_v_feats),
        "c_attn_masks": t(c_attn_masks.astype(np.int64)),
        "num_subs": num_subs,
        "sub_idx2frame_idx": sub_idx2frame_idx,
    }


def _our_batch(num_subs, sub_frames, txt, c_v_feats, c_attn_masks):
    B, S = len(num_subs), max(num_subs)
    Lt = max(len(i) for v in txt for i in v)
    Fs = max(len(f) for v in sub_frames for f in v)
    batch = {
        "sub_input_ids": np.full((B, S, Lt), 1, np.int32),
        "sub_txt_mask": np.zeros((B, S, Lt), np.float32),
        "sub_frame_idx": np.zeros((B, S, Fs), np.int32),
        "sub_frame_mask": np.zeros((B, S, Fs), np.float32),
        "sub_mask": np.zeros((B, S), np.float32),
        "c_v_feats": c_v_feats.copy(),
        "c_attn_masks": c_attn_masks.copy(),
    }
    for vi in range(B):
        for si in range(num_subs[vi]):
            ids = txt[vi][si]
            frames = sub_frames[vi][si]
            batch["sub_input_ids"][vi, si, :len(ids)] = ids
            batch["sub_txt_mask"][vi, si, :len(ids)] = 1
            batch["sub_frame_idx"][vi, si, :len(frames)] = frames
            batch["sub_frame_mask"][vi, si, :len(frames)] = 1
            batch["sub_mask"][vi, si] = 1
    return {k: jnp.asarray(v) for k, v in batch.items()}


def test_forward_repr_parity(models):
    import torch
    tmodel, jcfg, params = models
    scen = _scenario()
    ref_batch = _ref_batch(*scen)
    our_batch = _our_batch(*scen)
    with torch.no_grad():
        want = tmodel.v_encoder(
            __import__("collections").defaultdict(lambda: None, ref_batch),
            "repr").numpy()
    from hero_tpu.models import model as backbone
    got = np.asarray(backbone.forward_repr(params["v_encoder"], jcfg,
                                           our_batch, dtype=jnp.float32))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_vsm_heads_parity(models):
    import torch
    tmodel, jcfg, params = models
    scen = _scenario(1)
    ref_batch = _ref_batch(*scen)
    our_batch = _our_batch(*scen)
    r = np.random.RandomState(2)
    Nq, Lq = 4, 6  # 2 queries per video
    q_ids = r.randint(3, 128, (Nq, Lq)).astype(np.int64)
    q_mask = np.ones((Nq, Lq), np.int64)

    with torch.no_grad():
        frame_emb_t = tmodel.v_encoder(
            __import__("collections").defaultdict(lambda: None, ref_batch),
            "repr")
        mod_q_t = tmodel.encode_txt_inputs(
            torch.tensor(q_ids),
            torch.tensor(np.arange(Lq, dtype=np.int64)[None]),
            torch.tensor(q_mask), attn_layer=tmodel.q_feat_attn)
        st_t, ed_t = tmodel.get_pred_from_mod_query(
            frame_emb_t, torch.tensor(scen[4]), mod_q_t, cross=True)
        scores_t = tmodel.get_video_level_scores(
            mod_q_t, frame_emb_t, torch.tensor(scen[4]),
            val_gather_gpus=False)

    from hero_tpu.models import pretrain as our_pretrain
    from hero_tpu.models import model as backbone
    frame_emb = backbone.forward_repr(params["v_encoder"], jcfg, our_batch,
                                      dtype=jnp.float32)
    mod_q = our_pretrain.encode_query(params, jcfg, jnp.asarray(q_ids),
                                      jnp.asarray(q_mask,
                                                  dtype=jnp.float32),
                                      dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(mod_q), mod_q_t.numpy(),
                               rtol=2e-4, atol=2e-4)
    st, ed = our_pretrain.get_st_ed_logits(
        params["head"], mod_q, frame_emb,
        jnp.asarray(scen[4]), cross=True)
    np.testing.assert_allclose(np.asarray(st), st_t.numpy(), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(ed), ed_t.numpy(), rtol=2e-4,
                               atol=2e-4)
    scores = our_pretrain.get_video_level_scores(
        mod_q, frame_emb, jnp.asarray(scen[4]))
    np.testing.assert_allclose(np.asarray(scores), scores_t.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_video_level_loss_parity(models):
    """Ranking-loss semantics vs the reference on an un-padded square case."""
    import torch
    tmodel, jcfg, params = models
    r = np.random.RandomState(3)
    Nv, Q = 4, 2
    Nq = Nv * Q
    scores = r.randn(Nq, Nv).astype(np.float32) * 0.2
    with torch.no_grad():
        l_ctx_t, l_q_t = tmodel.get_video_level_loss(
            torch.tensor(scores), reduction="mean")
    from hero_tpu.models.pretrain import VsmConfig, video_level_loss
    vsm = VsmConfig(lw_neg_ctx=1.0, lw_neg_q=1.0)
    l_ctx, l_q = video_level_loss(
        jnp.asarray(scores), jnp.ones((Nq,)), Q, vsm,
        use_hard_negative=False, hard_pool_size=20, hard_neg_weight=10)
    assert float(l_ctx) == pytest.approx(float(l_ctx_t), rel=1e-5)
    assert float(l_q) == pytest.approx(float(l_q_t), rel=1e-5)
    # hard-negative weighting path
    tmodel.set_hard_negative(True, 2, 10)
    with torch.no_grad():
        l_ctx_t, l_q_t = tmodel.get_video_level_loss(
            torch.tensor(scores), reduction="mean")
    l_ctx, l_q = video_level_loss(
        jnp.asarray(scores), jnp.ones((Nq,)), Q, vsm,
        use_hard_negative=True, hard_pool_size=2, hard_neg_weight=10.0)
    tmodel.set_hard_negative(False, 20, 10)
    assert float(l_ctx) == pytest.approx(float(l_ctx_t), rel=1e-5)
    assert float(l_q) == pytest.approx(float(l_q_t), rel=1e-5)
