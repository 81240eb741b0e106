"""RoBERTa partial-init: stride subsampling + type-emb quirk + overlay."""

import numpy as np
import pytest

import jax

from hero_tpu.config.model_config import tiny_hero_config
from hero_tpu.convert.roberta_init import (init_f_encoder_from_roberta,
                                           roberta_to_f_encoder,
                                           subsample_layers)


def fake_roberta_sd(n_layers=12, hidden=32, vocab=120, n_types=1):
    r = np.random.RandomState(0)
    sd = {}
    p = "roberta"
    sd[f"{p}.embeddings.word_embeddings.weight"] = r.randn(vocab, hidden)
    sd[f"{p}.embeddings.position_embeddings.weight"] = r.randn(64, hidden)
    sd[f"{p}.embeddings.token_type_embeddings.weight"] = r.randn(n_types,
                                                                 hidden)
    sd[f"{p}.embeddings.LayerNorm.weight"] = np.ones(hidden)
    sd[f"{p}.embeddings.LayerNorm.bias"] = np.zeros(hidden)
    for i in range(n_layers):
        b = f"{p}.encoder.layer.{i}"
        for mod in ("attention.self.query", "attention.self.key",
                    "attention.self.value", "attention.output.dense",
                    "intermediate.dense", "output.dense"):
            shape = ((hidden * 4, hidden) if mod == "intermediate.dense"
                     else (hidden, hidden * 4) if mod == "output.dense"
                     else (hidden, hidden))
            sd[f"{b}.{mod}.weight"] = r.randn(*shape) + i  # layer-tagged
            sd[f"{b}.{mod}.bias"] = np.zeros(shape[0]) + i
        for ln in ("attention.output.LayerNorm", "output.LayerNorm"):
            sd[f"{b}.{ln}.weight"] = np.ones(hidden) * (i + 1)
            sd[f"{b}.{ln}.bias"] = np.zeros(hidden)
    return sd


def test_subsample_stride():
    sd = fake_roberta_sd()
    out = subsample_layers(sd, 6)
    # layers 1,3,5,7,9,11 -> 0..5 (gap=2)
    got = out["roberta.encoder.layer.0.attention.output.LayerNorm.weight"]
    np.testing.assert_array_equal(got, np.ones(32) * 2)  # orig layer 1
    got5 = out["roberta.encoder.layer.5.attention.output.LayerNorm.weight"]
    np.testing.assert_array_equal(got5, np.ones(32) * 12)  # orig layer 11
    assert "roberta.encoder.layer.6.attention.self.query.weight" not in out


def test_roberta_to_f_encoder_and_overlay():
    cfg = tiny_hero_config()  # f has 2 layers, hidden 32, vocab 128
    sd = fake_roberta_sd(hidden=32, vocab=120)
    sub = roberta_to_f_encoder(sd, n_layers=2, vocab_size=128)
    # vocab padded 120 -> 128 with zeros
    assert sub["embeddings"]["word_emb"].shape == (128, 32)
    np.testing.assert_array_equal(sub["embeddings"]["word_emb"][120:], 0)
    # type emb duplicated row
    np.testing.assert_array_equal(sub["embeddings"]["type_emb"][0],
                                  sub["embeddings"]["type_emb"][1])
    # stacked layers: gap = 6 -> original layers 5, 11
    ln = sub["encoder"]["layers"]["attention"]["out_ln"]["scale"]
    np.testing.assert_array_equal(ln[0], np.ones(32) * 6)
    np.testing.assert_array_equal(ln[1], np.ones(32) * 12)

    from hero_tpu.models import pretrain
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(0), cfg)
    merged = init_f_encoder_from_roberta(params, sd, n_layers=2,
                                         vocab_size=128)
    np.testing.assert_array_equal(
        np.asarray(merged["v_encoder"]["f_encoder"]["embeddings"]
                   ["word_emb"])[:120],
        sd["roberta.embeddings.word_embeddings.weight"].astype(np.float32))
    # model still runs with merged params
    from tests.test_backbone import tiny_batch
    from hero_tpu.models import model as backbone
    out = backbone.forward_repr(merged["v_encoder"], cfg, tiny_batch(cfg))
    assert np.isfinite(np.asarray(out)).all()
