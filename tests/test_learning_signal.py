"""Learning-signal test: VSM training on correlated synthetic data must
improve video retrieval over the untrained model.

Builds a corpus where each video has a distinctive feature direction and
its queries carry identifying tokens, trains the tiny model for a few
dozen steps, and checks R@1 goes to (near) perfect while the untrained
model stays near chance.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hero_tpu.config.model_config import tiny_hero_config
from hero_tpu.models import pretrain
from hero_tpu.training.step import TrainSpec, TrainState, make_train_step

N_VID, F, VDIM, Q, LQ = 8, 16, 64, 1, 6


def correlated_batch(seed=0):
    """Every video v has feature direction e_v and query tokens 10+v."""
    r = np.random.RandomState(seed)
    B, S, Lt, Fs = N_VID, 2, 8, 8
    feats = np.zeros((B, F, VDIM), np.float32)
    for v in range(B):
        feats[v] += r.randn(F, VDIM) * 0.1
        feats[v, :, v] += 3.0          # identity direction
    q_ids = np.zeros((B, Q, LQ), np.int32)
    for v in range(B):
        q_ids[v, :, 0] = 0             # CLS
        q_ids[v, :, 1:] = 10 + v       # identity tokens
    sub_ids = r.randint(40, 80, (B, S, Lt)).astype(np.int32)
    frames_idx = np.stack([np.arange(Fs), Fs + np.arange(Fs)])[None]
    batch = {
        "sub_input_ids": sub_ids,
        "sub_txt_mask": np.ones((B, S, Lt), np.float32),
        "sub_frame_idx": np.broadcast_to(frames_idx,
                                         (B, S, Fs)).astype(np.int32),
        "sub_frame_mask": np.ones((B, S, Fs), np.float32),
        "sub_mask": np.ones((B, S), np.float32),
        "c_v_feats": feats,
        "c_attn_masks": np.ones((B, F), np.float32),
        "query_input_ids": q_ids,
        "query_attn_masks": np.ones((B, Q, LQ), np.float32),
        "q_mask": np.ones((B, Q), np.float32),
        "targets": np.tile(np.asarray([[2, 9]], np.int32), (B, 1))[:,
                                                                   None, :],
    }
    return {k: jnp.asarray(v) for k, v in batch.items()}


def recall_at_1(params, cfg, vsm, batch):
    scores, _, _ = pretrain.forward_vsm(params, cfg, vsm, batch,
                                        compute_loss=False)
    pred = np.asarray(jnp.argmax(scores, axis=1))     # (Nq,)
    gt = np.arange(N_VID)                             # query i ↔ video i
    return float((pred == gt).mean())


def test_vsm_training_learns_retrieval():
    cfg = tiny_hero_config()
    vsm = pretrain.VsmConfig(lw_neg_ctx=4.0, lw_neg_q=4.0, lw_st_ed=0.02)
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(0), cfg)
    batch = correlated_batch()

    r1_init = recall_at_1(params, cfg, vsm, batch)

    def loss_fn(p, b, rng):
        a, x, y = pretrain.forward_vsm(p, cfg, vsm, b, rng=rng, train=True)
        return a + x + y, {}

    spec = TrainSpec(learning_rate=2e-3, warmup_steps=5,
                     num_train_steps=200, grad_norm=1.0)
    step = make_train_step(loss_fn, spec, donate=False)
    state = TrainState.create(params)
    losses = []
    for i in range(60):
        state, m = step(state, correlated_batch(seed=i % 4),
                        jax.random.PRNGKey(100 + i))
        losses.append(float(m["loss"]))

    r1_final = recall_at_1(state.params, cfg, vsm, batch)
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
    assert r1_final >= 0.75, (r1_init, r1_final)
    assert r1_final > r1_init + 0.2, (r1_init, r1_final)

    # span prediction also picks up the constant [2, 9] target
    _, st, ed = pretrain.forward_vsm(state.params, cfg, vsm, batch,
                                     compute_loss=False)
    st_pred = np.asarray(jnp.argmax(st, -1)).reshape(-1)
    assert (np.abs(st_pred - 2) <= 2).mean() >= 0.5, st_pred
