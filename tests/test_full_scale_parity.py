"""Full-flagship checkpoint-fidelity drill (VERDICT round-1 item 5).

Builds the REAL-size reference model (768 hidden / 6+3 layers / 50265
vocab, ``/root/reference/config/hero_pretrain.json`` — the pre-pad
"from-RoBERTa" config), converts its randomly-initialized state dict, and
asserts forward parity at full scale.  Exercises:

- vocab padding 50265 → 50272 (reference ``pad_vocab``,
  model/encoder.py:226-235),
- ``infer_max_frm_seq_len`` from the img position table,
- type-embedding 1 → 2-row re-init (``init_type_embedding``,
  model/encoder.py:287-295),
- 12 → 6 stride RoBERTa partial load at real size
  (``load_partial_checkpoint``, model/modeling_utils.py:46-65) against a
  full-size roberta-base-shaped state dict.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_reference_parity import ref  # noqa: F401  (fixture)

VFEAT = 4352
CLIP_LEN = 12
FULL_JSON = "/root/reference/config/hero_pretrain.json"


@pytest.fixture(scope="module")
def full_models(ref):  # noqa: F811
    import torch
    ref_pretrain, ref_model = ref
    torch.manual_seed(0)
    tmodel = ref_pretrain.HeroForPretraining(
        ref_model.VideoModelConfig(FULL_JSON),
        vfeat_dim=VFEAT, max_frm_seq_len=100,
        lw_neg_ctx=1.0, lw_neg_q=1.0, lw_st_ed=0.01, drop_svmr_prob=0)
    # the real pipeline reaches this state via load_partial_pretrained →
    # init_type_embedding (1-row RoBERTa type table → 2 rows, mask-emb row
    # 0 zeroed, model/model.py:343-346); replicate it on the random init
    tmodel.v_encoder.init_type_embedding()
    tmodel.eval()

    sd = tmodel.state_dict()
    from hero_tpu.convert.torch_checkpoint import (convert_state_dict,
                                                   infer_max_frm_seq_len)
    assert infer_max_frm_seq_len(sd) == 100
    # reference init_type_embedding replaced the 1-row table with 2 rows
    assert sd["v_encoder.f_encoder.embeddings.token_type_embeddings."
              "weight"].shape[0] == 2

    params = convert_state_dict(sd, vocab_size=50272)
    assert "__unexpected__" not in params, list(params["__unexpected__"])
    word = params["v_encoder"]["f_encoder"]["embeddings"]["word_emb"]
    assert word.shape == (50272, 768)          # padded 50265 -> 50272
    np.testing.assert_array_equal(np.asarray(word[50265:]), 0.0)

    from hero_tpu.config.model_config import HeroConfig
    with open(FULL_JSON) as f:
        jdict = json.load(f)
    jdict["f_config"]["vocab_size"] = 50272    # our side runs padded
    jcfg = HeroConfig.from_dict(jdict, vfeat_dim=VFEAT,
                                max_frm_seq_len=100,
                                max_clip_len=CLIP_LEN)
    params = jax.tree.map(jnp.asarray, params)
    return tmodel, jcfg, params


def _scenario(seed=0):
    r = np.random.RandomState(seed)
    num_subs = [2, 3]
    sub_frames = [[[0, 1, 2], [3, 4]],
                  [[0, 1], [2, 3, 4, 5], [6]]]
    txt = [[list(r.randint(3, 50265, 5)), list(r.randint(3, 50265, 4))],
           [list(r.randint(3, 50265, 3)), list(r.randint(3, 50265, 6)),
            list(r.randint(3, 50265, 4))]]
    c_v_feats = (r.randn(2, CLIP_LEN, VFEAT).astype(np.float32) * 0.5)
    c_attn_masks = np.ones((2, CLIP_LEN), np.float32)
    return num_subs, sub_frames, txt, c_v_feats, c_attn_masks


def _batches(scen):
    import test_reference_parity as tp
    orig_vfeat, orig_clip = tp.VFEAT, tp.CLIP_LEN
    tp.VFEAT, tp.CLIP_LEN = VFEAT, CLIP_LEN
    try:
        return tp._ref_batch(*scen), tp._our_batch(*scen)
    finally:
        tp.VFEAT, tp.CLIP_LEN = orig_vfeat, orig_clip


def test_full_scale_forward_repr_parity(full_models):
    import collections
    import torch
    tmodel, jcfg, params = full_models
    scen = _scenario()
    ref_batch, our_batch = _batches(scen)
    with torch.no_grad():
        want = tmodel.v_encoder(
            collections.defaultdict(lambda: None, ref_batch),
            "repr").numpy()
    from hero_tpu.models import model as backbone
    got = np.asarray(backbone.forward_repr(params["v_encoder"], jcfg,
                                           our_batch, dtype=jnp.float32))
    assert got.shape == want.shape
    # 768-dim / 9-layer accumulation: slightly looser than the tiny test
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_full_scale_vsm_heads_parity(full_models):
    import collections
    import torch
    tmodel, jcfg, params = full_models
    scen = _scenario(1)
    ref_batch, our_batch = _batches(scen)
    r = np.random.RandomState(2)
    Nq, Lq = 4, 6
    q_ids = r.randint(3, 50265, (Nq, Lq)).astype(np.int64)
    q_mask = np.ones((Nq, Lq), np.int64)
    with torch.no_grad():
        frame_emb_t = tmodel.v_encoder(
            collections.defaultdict(lambda: None, ref_batch), "repr")
        mod_q_t = tmodel.encode_txt_inputs(
            torch.tensor(q_ids),
            torch.tensor(np.arange(Lq, dtype=np.int64)[None]),
            torch.tensor(q_mask), attn_layer=tmodel.q_feat_attn)
        scores_t = tmodel.get_video_level_scores(
            mod_q_t, frame_emb_t, torch.tensor(scen[4]),
            val_gather_gpus=False)
    from hero_tpu.models import model as backbone
    from hero_tpu.models import pretrain as our_pretrain
    frame_emb = backbone.forward_repr(params["v_encoder"], jcfg, our_batch,
                                      dtype=jnp.float32)
    mod_q = our_pretrain.encode_query(
        params, jcfg, jnp.asarray(q_ids),
        jnp.asarray(q_mask, dtype=jnp.float32), dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(mod_q), mod_q_t.numpy(),
                               rtol=5e-3, atol=5e-3)
    scores = our_pretrain.get_video_level_scores(
        mod_q, frame_emb, jnp.asarray(scen[4]))
    np.testing.assert_allclose(np.asarray(scores), scores_t.numpy(),
                               rtol=5e-3, atol=5e-3)


def test_full_scale_roberta_stride_init(ref):  # noqa: F811
    """12→6 stride partial load at real roberta-base size: the reference's
    load_partial_checkpoint path vs our roberta_to_f_encoder must agree on
    every converted tensor."""
    import torch
    from test_roberta_init import fake_roberta_sd
    from hero_tpu.convert.roberta_init import roberta_to_f_encoder
    from hero_tpu.convert.torch_checkpoint import convert_state_dict

    torch.manual_seed(1)
    rsd = fake_roberta_sd(n_layers=12, hidden=768, vocab=50265, n_types=1)

    import model.modeling_utils as mu
    partial = mu.load_partial_checkpoint(rsd, 6, skip_layers=True)
    # layers kept: 1,3,5,7,9,11 renumbered 0..5
    for i, l in enumerate(range(1, 12, 2)):
        np.testing.assert_array_equal(
            partial[f"roberta.encoder.layer.{i}.attention.self.query"
                    ".weight"],
            rsd[f"roberta.encoder.layer.{l}.attention.self.query.weight"])

    ours = roberta_to_f_encoder(rsd, n_layers=6, vocab_size=50272,
                                hidden=768)
    # word emb padded; row 50265+ zero; stride layers match the reference
    assert ours["embeddings"]["word_emb"].shape[0] == 50272
    np.testing.assert_array_equal(ours["embeddings"]["word_emb"][50265:],
                                  0.0)
    q0 = ours["encoder"]["layers"]["attention"]["query"]["kernel"][0]
    np.testing.assert_allclose(
        np.asarray(q0),
        np.asarray(rsd["roberta.encoder.layer.1.attention.self.query"
                       ".weight"]).T, rtol=1e-6)
    q5 = ours["encoder"]["layers"]["attention"]["query"]["kernel"][5]
    np.testing.assert_allclose(
        np.asarray(q5),
        np.asarray(rsd["roberta.encoder.layer.11.attention.self.query"
                       ".weight"]).T, rtol=1e-6)
    # type emb: 1 row duplicated to 2 identical rows (init_type_embedding)
    te = ours["embeddings"]["type_emb"]
    assert te.shape[0] == 2
    np.testing.assert_array_equal(te[0], te[1])
