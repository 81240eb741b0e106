"""Task-head tests: VCMR/VR inference, VideoQA, VIOLIN, TVC (+KV cache)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hero_tpu.config.model_config import tiny_hero_config
from hero_tpu.models import pretrain, tvc, vcmr, videoqa, violin
from tests.test_backbone import tiny_batch


@pytest.fixture(scope="module")
def cfg():
    return tiny_hero_config()


def test_vcmr_inference_cross(cfg):
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(0), cfg)
    batch = tiny_batch(cfg)
    vsm = pretrain.VsmConfig(lw_neg_ctx=1.0, lw_neg_q=1.0)
    frame_emb = vcmr.encode_video_corpus(params, cfg, batch)
    Nq = 3
    r = np.random.RandomState(0)
    qids = jnp.asarray(r.randint(2, 128, (Nq, 6)), jnp.int32)
    qmask = jnp.ones((Nq, 6), jnp.float32)
    scores, st, ed = vcmr.get_pred_from_raw_query(
        params, cfg, vsm, frame_emb, batch["c_attn_masks"], qids, qmask)
    Nv, F = batch["c_attn_masks"].shape
    assert scores.shape == (Nq, Nv)
    assert st.shape == (Nq, Nv, F) and ed.shape == (Nq, Nv, F)
    assert np.isfinite(np.asarray(scores)).all()
    # cross st/ed must agree with paired mode for matched (q, v) pairs
    mod_q = pretrain.encode_query(params, cfg, qids, qmask)
    own = frame_emb[:Nq % Nv + 1]  # arbitrary; just check first pair
    st_pair, _ = pretrain.get_st_ed_logits(
        params["head"], mod_q[:1], frame_emb[:1],
        batch["c_attn_masks"][:1].astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(st[0, 0]), np.asarray(st_pair[0]),
                               rtol=1e-4, atol=1e-4)


def test_vr_forward(cfg):
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(1), cfg)
    batch = tiny_batch(cfg)
    vsm = pretrain.VsmConfig(lw_neg_ctx=1.0, lw_neg_q=1.0, lw_st_ed=0.0)
    l_ctx, l_q = vcmr.forward_vr(params, cfg, vsm, batch)
    assert np.isfinite(float(l_ctx)) and np.isfinite(float(l_q))


def test_videoqa(cfg):
    A = 2
    params = videoqa.init_hero_for_videoqa(jax.random.PRNGKey(2), cfg)
    base = tiny_batch(cfg, B=4)  # 2 videos x 2 answers
    r = np.random.RandomState(3)
    Nv = 2
    base["qa_input_ids"] = jnp.asarray(
        r.randint(2, 128, (4, 7)), jnp.int32)
    base["qa_attn_masks"] = jnp.ones((4, 7), jnp.float32)
    base["targets"] = jnp.asarray(r.randint(0, A, (Nv,)), jnp.int32)
    base["ts_targets"] = jnp.asarray(
        r.randint(0, cfg.max_clip_len, (Nv, 2)), jnp.int32)
    qa_loss, t_loss = videoqa.forward_videoqa(params, cfg, base,
                                              num_answers=A)
    assert np.isfinite(float(qa_loss)) and np.isfinite(float(t_loss))
    logits = videoqa.forward_videoqa(params, cfg, base, num_answers=A,
                                     compute_loss=False)
    assert logits.shape == (Nv, A)


def test_violin(cfg):
    params = violin.init_hero_for_violin(jax.random.PRNGKey(4), cfg)
    batch = tiny_batch(cfg)
    r = np.random.RandomState(5)
    B = batch["c_v_feats"].shape[0]
    batch["q_input_ids"] = jnp.asarray(r.randint(2, 128, (B, 9)), jnp.int32)
    batch["q_attn_masks"] = jnp.ones((B, 9), jnp.float32)
    batch["targets"] = jnp.asarray(r.randint(0, 2, (B,)), jnp.int32)
    loss = violin.forward_violin(params, cfg, batch)
    assert np.isfinite(float(loss)) and float(loss) > 0


def _tvc_batch(cfg, B=2, Ncap=3, Lv=6, Lt=5, seed=6):
    r = np.random.RandomState(seed)
    batch = tiny_batch(cfg, B=B)
    F = cfg.max_clip_len
    batch["cap_vidx"] = jnp.asarray(r.randint(0, B, (Ncap,)), jnp.int32)
    batch["seg_idx"] = jnp.asarray(r.randint(0, F, (Ncap, Lv)), jnp.int32)
    batch["seg_mask"] = jnp.ones((Ncap, Lv), jnp.float32)
    batch["cap_input_ids"] = jnp.asarray(
        r.randint(2, 128, (Ncap, Lt)), jnp.int32)
    tgt = r.randint(2, 128, (Ncap, Lt))
    tgt[:, -1] = -1
    batch["cap_tgt_ids"] = jnp.asarray(tgt, jnp.int32)
    return batch


def test_tvc_train_loss(cfg):
    params = tvc.init_hero_for_tvc(jax.random.PRNGKey(7), cfg)
    batch = _tvc_batch(cfg)
    s, n = tvc.forward_tvc(params, cfg, batch, lsr=0.1)
    assert np.isfinite(float(s)) and float(n) > 0
    s2, n2 = tvc.forward_tvc(params, cfg, batch, lsr=0.0)
    assert np.isfinite(float(s2))
    g = jax.grad(lambda p: tvc.forward_tvc(p, cfg, batch)[0])(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(g))


def test_tvc_greedy_kv_cache_matches_full_decoder(cfg):
    """The KV-cached incremental decode must reproduce the reference's
    re-run-full-decoder greedy outputs exactly."""
    params = tvc.init_hero_for_tvc(jax.random.PRNGKey(8), cfg)
    batch = _tvc_batch(cfg)
    bos, eos, T = 0, 2, 6
    out = np.asarray(tvc.greedy_decode(params, cfg, batch, max_step=T,
                                       bos=bos, eos=eos))
    # replay: teacher-force the generated prefix through the full decoder
    enc_out = tvc.encode(params, cfg, batch)
    Ncap = out.shape[0]
    for t in range(T):
        prefix = np.concatenate(
            [np.full((Ncap, 1), bos), out[:, :t]], axis=1).astype(np.int32)
        logits = tvc.decode(params, cfg, enc_out, batch["seg_mask"],
                            jnp.asarray(prefix))
        pred = np.asarray(jnp.argmax(logits[:, -1], -1))
        np.testing.assert_array_equal(pred, out[:, t], err_msg=f"step {t}")


def test_tvc_beam_not_worse_than_greedy(cfg):
    params = tvc.init_hero_for_tvc(jax.random.PRNGKey(9), cfg)
    batch = _tvc_batch(cfg)
    bos, eos, T = 0, 2, 5
    beam_out = tvc.beam_decode(params, cfg, batch, max_step=T, bos=bos,
                               eos=eos, beam=3)
    assert beam_out.shape == (3, T)
    assert np.asarray(beam_out).dtype == np.int32


def test_mfm_nce_cap_tracks_mask_prob():
    """The static NCE row cap must cover the CONFIGURED mask probability:
    at mask_prob=0.4 every masked row enters the loss (a fixed 0.25*N cap
    silently truncated loss and denominator — round-3 review finding)."""
    import jax.numpy as jnp
    import numpy as np
    from hero_tpu.models.model import _mfm_nce_loss, _mfm_nce_row_cap

    r = np.random.RandomState(0)
    B, F, V = 8, 100, 64
    pred = jnp.asarray(r.randn(B, F, V).astype(np.float32))
    tgt = jnp.asarray(r.randn(B, F, V).astype(np.float32))
    mask = (r.rand(B, F) < 0.4).astype(np.float32)
    n_masked = int(mask.sum())
    assert n_masked > 0.25 * B * F   # would overflow the old fixed cap

    # exact reference formulation: dynamic masked-row extraction
    N = B * F
    p = np.asarray(pred).reshape(N, V)
    t = np.asarray(tgt).reshape(N, V)
    m = mask.reshape(N) > 0
    pos = p[m] @ t[m].T
    neg = p[m] @ p.T
    neg[:, m] = -1e4
    logits = np.concatenate([pos, neg], 1)
    mx = logits.max(1, keepdims=True)
    logp = logits - mx - np.log(np.exp(logits - mx).sum(1, keepdims=True))
    exact_sum = -logp[np.arange(m.sum()), np.arange(m.sum())].sum()

    s, n = _mfm_nce_loss(pred, tgt, jnp.asarray(mask),
                         jnp.asarray(1.0 - mask), 1.0, mask_prob=0.4)
    assert int(n) == n_masked
    np.testing.assert_allclose(float(s), exact_sum, rtol=1e-4)
    # default recipe cap unchanged vs the old fixed 0.25*N formula:
    # p=0.15, B=32, F=100 -> 0.25*N+32=832 -> 128-aligned 896
    assert _mfm_nce_row_cap(0.15, 3200, n_clips=32) == 896
    # short clips: MfmDataset forces >=1 masked frame per clip, so the
    # cap must cover n_clips even when mask_prob*N is tiny
    # (F=4, B=256, p=0.02 -> >=256 forced rows; binomial-only cap was 128)
    assert _mfm_nce_row_cap(0.02, 1024, n_clips=256) >= 256
