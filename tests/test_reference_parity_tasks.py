"""Numerical parity vs the reference for the task forwards:
MLM, FOM, MFM, VideoQA, VIOLIN, TVC (encode+decode)."""

import collections
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_reference_parity import (CLIP_LEN, VFEAT, _our_batch,
                                         _ref_batch, _scenario, models,
                                         ref, tiny_json)  # noqa: F401


def _dd(batch):
    return collections.defaultdict(lambda: None, batch)


# --------------------------------------------------------------------------
# MLM
# --------------------------------------------------------------------------

def test_mlm_parity(models):
    import torch
    tmodel, jcfg, params = models
    scen = _scenario(4)
    num_subs, sub_frames, txt, c_v_feats, c_attn_masks = scen

    # mask one token per sub (position 1)
    ref_batch = _ref_batch(*scen)
    N, max_tl = ref_batch["f_sub_input_ids"].shape
    max_vl = ref_batch["f_v_feats"].shape[1]
    out_size = ref_batch["f_attn_masks"].shape[1]
    input_ids = ref_batch["f_sub_input_ids"].clone()
    txt_labels = torch.full((N, max_tl), -1, dtype=torch.long)
    for i in range(N):
        txt_labels[i, 1] = input_ids[i, 1].item()
        input_ids[i, 1] = 3  # pretend-mask token
    txt_mask_tgt = torch.zeros((N, out_size), dtype=torch.bool)
    row_frames = [f for v in sub_frames for f in v]
    for i in range(N):
        txt_mask_tgt[i, len(row_frames[i]) + 1] = True

    mlm_batch = {
        "input_ids": input_ids,
        "position_ids": ref_batch["f_sub_pos_ids"],
        "v_feat": ref_batch["f_v_feats"],
        "f_pos_ids": ref_batch["f_v_pos_ids"],
        "attn_masks": ref_batch["f_attn_masks"],
        "gather_index": ref_batch["f_gather_index"],
        "txt_mask_tgt": txt_mask_tgt,
        "txt_labels": txt_labels[txt_labels != -1],
    }
    with torch.no_grad():
        want = tmodel.v_encoder(_dd(mlm_batch), "mlm",
                                compute_loss=False).numpy()  # (N_masked, V)

    our_batch = dict(_our_batch(*scen))
    B, S, Lt = our_batch["sub_input_ids"].shape
    ids = np.asarray(our_batch["sub_input_ids"]).copy()
    labels = np.full((B, S, 1), -1, np.int32)
    mask_pos = np.ones((B, S, 1), np.int32)
    for vi in range(B):
        for si in range(num_subs[vi]):
            labels[vi, si, 0] = ids[vi, si, 1]
            ids[vi, si, 1] = 3
    our_batch["sub_input_ids"] = jnp.asarray(ids)
    our_batch["mlm_mask_pos"] = jnp.asarray(mask_pos)
    our_batch["mlm_labels"] = jnp.asarray(labels)

    from hero_tpu.models import model as backbone
    got = np.asarray(backbone.forward_mlm(
        params["v_encoder"], jcfg, our_batch, compute_loss=False,
        dtype=jnp.float32))                                   # (B*S, 1, V)
    got_rows = []
    for vi in range(B):
        for si in range(num_subs[vi]):
            got_rows.append(got[vi * S + si, 0])
    np.testing.assert_allclose(np.stack(got_rows), want, rtol=3e-4,
                               atol=3e-4)


# --------------------------------------------------------------------------
# FOM
# --------------------------------------------------------------------------

def test_fom_parity(models):
    import torch
    tmodel, jcfg, params = models
    scen = _scenario(5)
    ref_batch = _ref_batch(*scen)
    B = 2
    r = np.random.RandomState(6)
    orders = np.stack([r.permutation(CLIP_LEN) for _ in range(B)])
    ref_batch["shuffled_orders"] = torch.tensor(orders, dtype=torch.long)
    with torch.no_grad():
        want = tmodel.v_encoder(_dd(ref_batch), "fom",
                                compute_loss=False).numpy()
    want = want.reshape(B, CLIP_LEN, -1)

    our_batch = dict(_our_batch(*scen))
    our_batch["shuffled_orders"] = jnp.asarray(orders.astype(np.int32))
    from hero_tpu.models import model as backbone
    got = np.asarray(backbone.forward_fom(
        params["v_encoder"], jcfg, our_batch, compute_loss=False,
        dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


# --------------------------------------------------------------------------
# MFM (nce variant exercises feat_regress + both mask embeddings)
# --------------------------------------------------------------------------

def test_mfm_parity(models):
    import torch
    tmodel, jcfg, params = models
    scen = _scenario(7)
    num_subs, sub_frames, txt, c_v_feats, c_attn_masks = scen
    r = np.random.RandomState(8)
    c_v_masks = np.zeros((2, CLIP_LEN), bool)
    c_v_masks[0, 1] = True
    c_v_masks[1, 3] = True

    # reference batch: f-level feats zeroed at masked frames + f_v_masks
    zeroed = c_v_feats * ~c_v_masks[..., None]
    ref_batch = _ref_batch(num_subs, sub_frames, txt, zeroed, c_attn_masks)
    row_frames = [f for v in sub_frames for f in v]
    max_vl = ref_batch["f_v_feats"].shape[1]
    f_v_masks = torch.zeros((len(row_frames), max_vl), dtype=torch.bool)
    row = 0
    for vi in range(2):
        for si in range(num_subs[vi]):
            for j, fidx in enumerate(sub_frames[vi][si]):
                f_v_masks[row, j] = bool(c_v_masks[vi, fidx])
            row += 1
    ref_batch["f_v_masks"] = f_v_masks
    ref_batch["c_v_feats"] = torch.tensor(zeroed)
    ref_batch["c_v_masks"] = torch.tensor(c_v_masks)
    with torch.no_grad():
        pred_t, neg_t = tmodel.v_encoder(_dd(ref_batch), "mfm-nce",
                                         compute_loss=False)
    pred_t = pred_t.numpy()

    our_batch = dict(_our_batch(num_subs, sub_frames, txt, c_v_feats,
                                c_attn_masks))
    our_batch["c_v_masks"] = jnp.asarray(c_v_masks.astype(np.float32))
    from hero_tpu.models import model as backbone
    got_all = np.asarray(backbone.forward_mfm(
        params["v_encoder"], jcfg, our_batch, loss="nce",
        compute_loss=False, dtype=jnp.float32))       # (B, F, vdim)
    got = got_all[np.asarray(c_v_masks)]
    np.testing.assert_allclose(got, pred_t, rtol=3e-4, atol=3e-4)


# --------------------------------------------------------------------------
# VideoQA / VIOLIN
# --------------------------------------------------------------------------

def _build_head_model(ref, tiny_json, cls_name):
    import torch
    import model.model as ref_model
    torch.manual_seed(1)
    if cls_name == "videoqa":
        import model.videoQA as m
        cls = m.HeroForVideoQA
    elif cls_name == "violin":
        import model.violin as m
        cls = m.HeroForViolin
    else:
        import model.tvc as m
        cls = m.HeroForTvc
    tm = cls(ref_model.VideoModelConfig(tiny_json), vfeat_dim=VFEAT,
             max_frm_seq_len=16)
    tm.eval()
    return tm


def test_videoqa_parity(ref, tiny_json, models):
    import torch
    _, jcfg, _ = models
    tm = _build_head_model(ref, tiny_json, "videoqa")
    from hero_tpu.convert.torch_checkpoint import convert_state_dict
    params = jax.tree.map(jnp.asarray,
                          convert_state_dict(tm.state_dict(),
                                             vocab_size=128))
    A = 2
    scen = _scenario(9)
    num_subs, sub_frames, txt, c_v_feats, c_attn_masks = scen
    # duplicate each video A times (answer copies)
    dup = ([num_subs[i // A] for i in range(2 * A)],
           [sub_frames[i // A] for i in range(2 * A)],
           [txt[i // A] for i in range(2 * A)],
           np.stack([c_v_feats[i // A] for i in range(2 * A)]),
           np.stack([c_attn_masks[i // A] for i in range(2 * A)]))
    ref_batch = _ref_batch(*dup)
    r = np.random.RandomState(10)
    Lqa = 7
    qa_ids = r.randint(3, 128, (2 * A, Lqa)).astype(np.int64)
    ref_batch["qa_input_ids"] = torch.tensor(qa_ids)
    ref_batch["qa_pos_ids"] = torch.tensor(
        np.arange(Lqa, dtype=np.int64)[None])
    ref_batch["qa_attn_masks"] = torch.ones((2 * A, Lqa),
                                            dtype=torch.long)
    ref_batch["targets"] = torch.tensor([[0], [1]])
    with torch.no_grad():
        want = tm(_dd(ref_batch), "tvqa", compute_loss=False).numpy()

    our_batch = dict(_our_batch(*dup))
    our_batch["qa_input_ids"] = jnp.asarray(qa_ids.astype(np.int32))
    our_batch["qa_attn_masks"] = jnp.ones((2 * A, Lqa), jnp.float32)
    from hero_tpu.models import videoqa as our_videoqa
    got = np.asarray(our_videoqa.forward_videoqa(
        params, jcfg, our_batch, num_answers=A, compute_loss=False,
        dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_violin_parity(ref, tiny_json, models):
    import torch
    _, jcfg, _ = models
    tm = _build_head_model(ref, tiny_json, "violin")
    from hero_tpu.convert.torch_checkpoint import convert_state_dict
    params = jax.tree.map(jnp.asarray,
                          convert_state_dict(tm.state_dict(),
                                             vocab_size=128))
    scen = _scenario(11)
    ref_batch = _ref_batch(*scen)
    r = np.random.RandomState(12)
    Lq = 9
    q_ids = r.randint(3, 128, (2, Lq)).astype(np.int64)
    ref_batch["q_input_ids"] = torch.tensor(q_ids)
    ref_batch["q_pos_ids"] = torch.tensor(
        np.arange(Lq, dtype=np.int64)[None])
    ref_batch["q_attn_masks"] = torch.ones((2, Lq), dtype=torch.long)
    with torch.no_grad():
        want = tm(_dd(ref_batch), "violin", compute_loss=False).numpy()

    our_batch = dict(_our_batch(*scen))
    our_batch["q_input_ids"] = jnp.asarray(q_ids.astype(np.int32))
    our_batch["q_attn_masks"] = jnp.ones((2, Lq), jnp.float32)
    from hero_tpu.models import violin as our_violin
    got = np.asarray(our_violin.forward_violin(
        params, jcfg, our_batch, compute_loss=False, dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


# --------------------------------------------------------------------------
# TVC encode + decode
# --------------------------------------------------------------------------

def test_tvc_parity(ref, tiny_json, models):
    import torch
    _, jcfg0, _ = models
    # add a decoder config
    with open(tiny_json) as f:
        cfg_d = json.load(f)
    cfg_d["d_config"] = dict(cfg_d["f_config"], num_hidden_layers=1)
    import tempfile, os
    fd, path = tempfile.mkstemp(suffix=".json")
    with os.fdopen(fd, "w") as f:
        json.dump(cfg_d, f)
    tm = _build_head_model(ref, path, "tvc")

    from hero_tpu.config.model_config import HeroConfig
    from hero_tpu.convert.torch_checkpoint import convert_state_dict
    jcfg = HeroConfig.from_dict(cfg_d, vfeat_dim=VFEAT, max_frm_seq_len=16,
                                max_clip_len=CLIP_LEN)
    params = jax.tree.map(jnp.asarray,
                          convert_state_dict(tm.state_dict(),
                                             vocab_size=128))

    scen = _scenario(13)
    ref_batch = _ref_batch(*scen)
    # one caption per video, clip_ranges [st, ed)
    clip_ranges = [[(1, 5)], [(2, 8)]]
    ref_batch["clip_ranges"] = clip_ranges
    Lv = 6
    cap_mask = torch.zeros((2, Lv), dtype=torch.long)
    cap_mask[0, :4] = 1
    cap_mask[1, :6] = 1
    r = np.random.RandomState(14)
    Lt = 5
    cap_ids = r.randint(3, 128, (2, Lt)).astype(np.int64)
    ref_batch["cap_attn_mask"] = cap_mask
    ref_batch["cap_input_ids"] = torch.tensor(cap_ids)
    ref_batch["cap_pos_ids"] = torch.tensor(
        np.arange(Lt, dtype=np.int64)[None])
    ref_batch["cap_tgt_ids"] = None
    with torch.no_grad():
        want = tm(_dd(ref_batch), compute_loss=False).numpy()

    our_batch = dict(_our_batch(*scen))
    seg_idx = np.zeros((2, Lv), np.int32)
    seg_idx[0, :4] = np.arange(1, 5)
    seg_idx[1, :6] = np.arange(2, 8)
    our_batch.update({
        "cap_vidx": jnp.asarray([0, 1], jnp.int32),
        "seg_idx": jnp.asarray(seg_idx),
        "seg_mask": jnp.asarray(np.asarray(cap_mask), jnp.float32),
        "cap_input_ids": jnp.asarray(cap_ids.astype(np.int32)),
    })
    from hero_tpu.models import tvc as our_tvc
    got = np.asarray(our_tvc.forward_tvc(
        params, jcfg, our_batch, compute_loss=False, dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
