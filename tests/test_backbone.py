"""Backbone + pretrain-head unit tests on a tiny config (CPU, 8 virt devs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hero_tpu.config.model_config import tiny_hero_config
from hero_tpu.models import model as backbone
from hero_tpu.models import pretrain


@pytest.fixture(scope="module")
def cfg():
    return tiny_hero_config()


@pytest.fixture(scope="module")
def params(cfg):
    return pretrain.init_hero_for_pretraining(jax.random.PRNGKey(0), cfg)


def tiny_batch(cfg, rng=0, B=2, S=3, Lt=8, Fs=4, Q=2, Lq=6):
    r = np.random.RandomState(rng)
    F = cfg.max_clip_len
    batch = {
        "sub_input_ids": r.randint(2, cfg.f_config.vocab_size,
                                   (B, S, Lt)).astype(np.int32),
        "sub_txt_mask": (r.rand(B, S, Lt) > 0.2).astype(np.float32),
        "sub_frame_idx": r.randint(0, F, (B, S, Fs)).astype(np.int32),
        "sub_frame_mask": (r.rand(B, S, Fs) > 0.2).astype(np.float32),
        "sub_mask": np.ones((B, S), np.float32),
        "c_v_feats": r.randn(B, F, cfg.vfeat_dim).astype(np.float32),
        "c_attn_masks": np.ones((B, F), np.float32),
        # vsm extras
        "query_input_ids": r.randint(2, cfg.f_config.vocab_size,
                                     (B, Q, Lq)).astype(np.int32),
        "query_attn_masks": np.ones((B, Q, Lq), np.float32),
        "q_mask": np.ones((B, Q), np.float32),
        "targets": r.randint(0, F, (B, Q, 2)).astype(np.int32),
    }
    return {k: jnp.asarray(v) for k, v in batch.items()}


def test_forward_repr_shapes(cfg, params):
    batch = tiny_batch(cfg)
    out = backbone.forward_repr(params["v_encoder"], cfg, batch)
    assert out.shape == (2, cfg.max_clip_len, cfg.f_config.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_collect_frame_outputs_matches_loop(cfg):
    r = np.random.RandomState(1)
    B, S, Fs, F, D = 2, 3, 4, 10, 8
    h = r.randn(B, S, Fs, D).astype(np.float32)
    idx = r.randint(0, F, (B, S, Fs)).astype(np.int32)
    valid = (r.rand(B, S, Fs) > 0.3).astype(np.float32)
    got = np.asarray(backbone.collect_frame_outputs(
        jnp.asarray(h), jnp.asarray(idx), jnp.asarray(valid), F))
    want = np.zeros((B, F, D), np.float32)
    for b in range(B):
        for s in range(S):
            for f in range(Fs):
                if valid[b, s, f]:
                    want[b, idx[b, s, f]] += h[b, s, f]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_vsm_losses(cfg, params):
    batch = tiny_batch(cfg)
    vsm = pretrain.VsmConfig(lw_neg_ctx=8.0, lw_neg_q=8.0, lw_st_ed=0.01)
    l_st_ed, l_ctx, l_q = pretrain.forward_vsm(
        params, cfg, vsm, batch, compute_loss=True)
    for name, l in [("st_ed", l_st_ed), ("ctx", l_ctx), ("q", l_q)]:
        assert np.isfinite(float(l)), name
        assert float(l) >= 0.0, name


def test_vsm_grads_flow(cfg, params):
    batch = tiny_batch(cfg)
    vsm = pretrain.VsmConfig(lw_neg_ctx=1.0, lw_neg_q=1.0, lw_st_ed=0.01)

    def loss_fn(p):
        a, b, c = pretrain.forward_vsm(p, cfg, vsm, batch)
        return a + b + c

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in leaves)
    assert total > 0.0


def test_mlm_fom_mfm(cfg, params):
    batch = tiny_batch(cfg)
    r = np.random.RandomState(2)
    B, S, Lt = batch["sub_input_ids"].shape
    F = cfg.max_clip_len
    M = 3
    batch["mlm_mask_pos"] = jnp.asarray(
        r.randint(0, Lt, (B, S, M)).astype(np.int32))
    labels = r.randint(2, cfg.f_config.vocab_size, (B, S, M))
    labels[r.rand(B, S, M) > 0.6] = -1
    batch["mlm_labels"] = jnp.asarray(labels.astype(np.int32))
    s, n = backbone.forward_mlm(params["v_encoder"], cfg, batch)
    assert np.isfinite(float(s)) and float(n) > 0

    orders = np.stack([r.permutation(F) for _ in range(B)]).astype(np.int32)
    tgts = orders.copy()
    tgts[r.rand(B, F) > 0.5] = -1
    batch["shuffled_orders"] = jnp.asarray(orders)
    batch["fom_targets"] = jnp.asarray(tgts)
    s, n = backbone.forward_fom(params["v_encoder"], cfg, batch)
    assert np.isfinite(float(s)) and float(n) > 0

    batch["c_v_masks"] = jnp.asarray(
        (r.rand(B, F) < 0.15).astype(np.float32))
    s, n = backbone.forward_mfm(params["v_encoder"], cfg, batch,
                                loss="nce")
    assert np.isfinite(float(s)) and float(n) > 0
    s, n = backbone.forward_mfm(params["v_encoder"], cfg, batch,
                                loss="regression")
    assert np.isfinite(float(s)) and float(n) > 0


def test_mfm_nce_capped_matches_dense():
    """The fixed-cap masked-row NCE (argsort gather, (M,M)+(M,N) logits)
    must equal the dense 2·(N,N) formulation it replaced — dropped pos
    columns carried -1e4 logits whose exp underflows to exactly 0."""
    r = np.random.RandomState(5)
    B, F, V = 4, 64, 16                       # N=256 > cap M=128
    pred = jnp.asarray(r.randn(B, F, V).astype(np.float32))
    targets = jnp.asarray(r.randn(B, F, V).astype(np.float32))
    valid = (r.rand(B, F) > 0.1).astype(np.float32)
    cmask = (r.rand(B, F) < 0.15).astype(np.float32) * valid
    masked = jnp.asarray(cmask)
    unmasked = jnp.asarray(valid * (1.0 - cmask))
    temp = 1.0

    def dense(pred, targets, masked, unmasked):
        from hero_tpu.models import nn
        N = B * F
        predf = pred.reshape(N, V)
        tgtf = targets.reshape(N, V)
        mflat, uflat = masked.reshape(N), unmasked.reshape(N)
        pos = nn.mask_logits(predf @ tgtf.T, mflat[None, :])
        neg = nn.mask_logits(predf @ predf.T, uflat[None, :])
        logp = jax.nn.log_softmax(
            jnp.concatenate([pos, neg], 1) / temp, axis=-1)
        nll = -jnp.take_along_axis(logp, jnp.arange(N)[:, None], 1)[:, 0]
        return jnp.sum(nll * mflat), jnp.sum(mflat)

    s_want, n_want = dense(pred, targets, masked, unmasked)
    s_got, n_got = backbone._mfm_nce_loss(pred, targets, masked,
                                          unmasked, temp)
    assert float(n_got) == float(n_want)
    np.testing.assert_allclose(float(s_got), float(s_want), rtol=1e-5)


def test_clip_level_projection_variant_exact(cfg, params):
    """The clip-level ImageEmbeddings projection (PROJECT_CLIP_LEVEL, an
    MXU-layout variant measured in tools/perf_sweep.py) must be EXACT vs
    the per-slot path on both forward_repr and the MFM path — LN/linear
    are row-wise so they commute with the frame gather."""
    batch = tiny_batch(cfg)
    r = np.random.RandomState(5)
    B, F = 2, cfg.max_clip_len
    batch["c_v_masks"] = jnp.asarray(
        (r.rand(B, F) < 0.3).astype(np.float32))
    old = backbone.PROJECT_CLIP_LEVEL
    try:
        backbone.PROJECT_CLIP_LEVEL = False
        repr_slot = np.asarray(
            backbone.forward_repr(params["v_encoder"], cfg, batch))
        mfm_slot = np.asarray(backbone.forward_mfm(
            params["v_encoder"], cfg, batch, loss="nce",
            compute_loss=False))
        backbone.PROJECT_CLIP_LEVEL = True
        repr_clip = np.asarray(
            backbone.forward_repr(params["v_encoder"], cfg, batch))
        mfm_clip = np.asarray(backbone.forward_mfm(
            params["v_encoder"], cfg, batch, loss="nce",
            compute_loss=False))
    finally:
        backbone.PROJECT_CLIP_LEVEL = old
    np.testing.assert_allclose(repr_slot, repr_clip, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(mfm_slot, mfm_clip, rtol=2e-5, atol=2e-5)


def test_dropout_train_mode(cfg, params):
    batch = tiny_batch(cfg)
    rng = jax.random.PRNGKey(3)
    out1 = backbone.forward_repr(params["v_encoder"], cfg, batch,
                                 rng=rng, train=True)
    out2 = backbone.forward_repr(params["v_encoder"], cfg, batch,
                                 rng=jax.random.PRNGKey(4), train=True)
    # different dropout keys → different outputs
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_prune_attention_heads(cfg):
    from hero_tpu.models import nn, transformer
    import jax.numpy as jnp
    tcfg = cfg.f_config
    p = transformer.init_attention(jax.random.PRNGKey(0), tcfg)
    H = tcfg.num_attention_heads
    pruned = nn.prune_attention_heads(p, [0], H)
    d_head = tcfg.hidden_size // H
    assert pruned["query"]["kernel"].shape == (
        tcfg.hidden_size, tcfg.hidden_size - d_head)
    assert pruned["out"]["kernel"].shape == (
        tcfg.hidden_size - d_head, tcfg.hidden_size)
    # pruned block still runs with a reduced-head config
    small = tcfg.replace(num_attention_heads=H - 1,
                         hidden_size=tcfg.hidden_size)
    x = jnp.ones((2, 5, tcfg.hidden_size))
    # manual apply: q/k/v with narrowed kernels
    q = nn.linear(pruned["query"], x)
    assert q.shape == (2, 5, tcfg.hidden_size - d_head)
