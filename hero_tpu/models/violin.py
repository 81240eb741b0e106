"""HeroForViolin — binary video-statement entailment.

Re-design of reference ``model/violin.py:18-84``: same fusion pattern as
VideoQA (frame states + statement tokens through the temporal encoder), a
single attention-pooled vector, MLP → sigmoid → BCE.

Batch extras: ``q_input_ids``/``q_attn_masks`` (B, Lq) statement tokens,
``targets`` (B,) ∈ {0., 1.}.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from hero_tpu.config.model_config import HeroConfig
from hero_tpu.models import model as backbone
from hero_tpu.models import nn
from hero_tpu.models.videoqa import _fuse_video_text

Params = Dict[str, Any]


def init_hero_for_violin(rng, cfg: HeroConfig) -> Params:
    r1, r2, r3 = jax.random.split(rng, 3)
    hsz = cfg.c_config.hidden_size
    return {
        "v_encoder": backbone.init_hierarchical_vl_model(r1, cfg),
        "head": {
            "violin_pool": nn.init_linear(r2, hsz, 1, bias=False),
            "violin_pred_head": nn.init_mlp_layer(r3, hsz, 1),
        },
    }


def get_modularized_video(head: Params, frame_emb: jax.Array,
                          frame_mask: jax.Array,
                          dtype=jnp.float32) -> jax.Array:
    """(Nv, L, D) → softmax-pooled (Nv, D) (reference violin.py:30-47)."""
    scores = nn.linear(head["violin_pool"], frame_emb, dtype)   # (Nv, L, 1)
    scores = nn.mask_logits(scores, frame_mask[..., None])
    att = jax.nn.softmax(scores.astype(jnp.float32), axis=1).astype(dtype)
    return jnp.einsum("vlm,vld->vmd", att, frame_emb)[:, 0]


def forward_violin(params: Params, cfg: HeroConfig,
                   batch: Dict[str, jax.Array], *,
                   compute_loss: bool = True, rng=None, train=False,
                   dtype=jnp.float32):
    """Reference violin.py:49-84. Returns mean BCE loss or logits (B, 1)."""
    video_emb = _fuse_video_text(params, cfg, batch, batch["q_input_ids"],
                                 batch["q_attn_masks"], rng=rng,
                                 train=train, dtype=dtype)
    video_masks = batch["c_attn_masks"].astype(jnp.float32)
    pooled = get_modularized_video(params["head"], video_emb, video_masks,
                                   dtype)
    logits = nn.mlp_layer(params["head"]["violin_pred_head"], pooled, dtype)
    if not compute_loss:
        return logits
    targets = batch["targets"].reshape(-1).astype(jnp.float32)
    x = logits[..., 0].astype(jnp.float32)
    # numerically-stable BCE-with-logits == sigmoid + binary_cross_entropy
    loss = jnp.maximum(x, 0.0) - x * targets + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(loss)
