"""HeroForVideoQA — 5-way multiple-choice QA + span supervision.

Re-design of reference ``model/videoQA.py:21-112``.  Batch layout: the
backbone batch rows are (video × answer) pairs, i.e. B' = Nv * A rows where
every group of A consecutive rows shares the same video but a different
QA-pair text.  Extras:

- ``qa_input_ids`` / ``qa_attn_masks`` (B', Lqa): [q ; SEP ; a] token ids
  appended after the frame sequence for the *temporal* encoder pass;
- ``targets`` (Nv,) answer index or -1;
- ``ts_targets`` (Nv, 2) start/end frame index or -1;
- ``num_answers`` static int A (5 for TVQA/How2QA).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from hero_tpu.config.model_config import HeroConfig
from hero_tpu.models import embed
from hero_tpu.models import encoder as enc
from hero_tpu.models import model as backbone
from hero_tpu.models import nn, transformer

Params = Dict[str, Any]


def init_hero_for_videoqa(rng, cfg: HeroConfig) -> Params:
    r1, r2, r3, r4, r5 = jax.random.split(rng, 5)
    hsz = cfg.c_config.hidden_size
    return {
        "v_encoder": backbone.init_hierarchical_vl_model(r1, cfg),
        "head": {
            "qa_pool": nn.init_linear(r2, hsz, 1, bias=False),
            "qa_pred_head": nn.init_mlp_layer(r3, hsz, 1),
            "st_ed_pool": nn.init_linear(r4, hsz, 1, bias=False),
            "st_ed_pred_head": nn.init_mlp_layer(r5, hsz, 2),
        },
    }


def _fuse_video_text(params: Params, cfg: HeroConfig,
                     batch: Dict[str, jax.Array], txt_ids: jax.Array,
                     txt_mask: jax.Array, *, rng=None, train=False,
                     dtype=jnp.float32) -> jax.Array:
    """Shared VideoQA/VIOLIN fusion (reference videoQA.py:68-85): frame
    states (pre-c_encoder) + FrameEmbeddings positions, concatenated with
    text embeddings, run through the temporal encoder.  Returns the video
    part (B', F, D)."""
    ve = params["v_encoder"]
    frame_feats = backbone.forward_repr(ve, cfg, batch, encode_clip=False,
                                        rng=nn.rng_for(rng, "repr"),
                                        train=train, dtype=dtype)
    frame_emb = embed.frame_embeddings(
        ve["c_encoder"]["embeddings"], frame_feats, cfg=cfg.c_config,
        rng=nn.rng_for(rng, "fpos"), train=train, dtype=dtype)
    txt_emb = embed.sub_embeddings(
        ve["f_encoder"]["embeddings"], txt_ids, cfg=cfg.f_config,
        rng=nn.rng_for(rng, "txt"), train=train, dtype=dtype)
    fused_in = jnp.concatenate([frame_emb, txt_emb], axis=1)
    fused_mask = jnp.concatenate(
        [batch["c_attn_masks"].astype(jnp.float32),
         txt_mask.astype(jnp.float32)], axis=1)
    fused = transformer.encoder(ve["c_encoder"]["encoder"], fused_in,
                                fused_mask, cfg.c_config,
                                rng=nn.rng_for(rng, "cenc"), train=train,
                                dtype=dtype)
    F = frame_feats.shape[1]
    return fused[:, :F, :]


def get_modularized_video(head: Params, frame_emb: jax.Array,
                          frame_mask: jax.Array, dtype=jnp.float32
                          ) -> Tuple[jax.Array, jax.Array]:
    """Two attention-pooled views (reference videoQA.py:36-59):
    st_ed pools over the *answer* axis per frame, qa pools over the *frame*
    axis per answer.  frame_emb (Nv, A, F, D), frame_mask (Nv, A, F)."""
    st_scores = nn.linear(head["st_ed_pool"], frame_emb, dtype)  # (Nv,A,F,1)
    qa_scores = nn.linear(head["qa_pool"], frame_emb, dtype)
    st_scores = nn.mask_logits(st_scores, frame_mask[..., None])
    qa_scores = nn.mask_logits(qa_scores, frame_mask[..., None])
    st_att = jax.nn.softmax(st_scores.astype(jnp.float32), axis=1)
    qa_att = jax.nn.softmax(qa_scores.astype(jnp.float32), axis=2)
    st_pooled = jnp.einsum("vqlm,vqld->vlmd", st_att.astype(dtype),
                           frame_emb)[:, :, 0]          # (Nv, F, D)
    qa_pooled = jnp.einsum("vqlm,vqld->vqmd", qa_att.astype(dtype),
                           frame_emb)[:, :, 0]          # (Nv, A, D)
    return st_pooled, qa_pooled


def forward_videoqa(params: Params, cfg: HeroConfig,
                    batch: Dict[str, jax.Array], *, num_answers: int = 5,
                    compute_loss: bool = True, rng=None, train=False,
                    dtype=jnp.float32):
    """Reference videoQA.py:61-112.  Returns (qa_loss, temporal_loss) or
    answer logits (Nv, A)."""
    video_emb = _fuse_video_text(params, cfg, batch, batch["qa_input_ids"],
                                 batch["qa_attn_masks"], rng=rng,
                                 train=train, dtype=dtype)
    Bp, F, D = video_emb.shape
    Nv = Bp // num_answers
    video_emb = video_emb.reshape(Nv, num_answers, F, D)
    video_masks = batch["c_attn_masks"].reshape(Nv, num_answers, F).astype(
        jnp.float32)
    st_pooled, qa_pooled = get_modularized_video(
        params["head"], video_emb, video_masks, dtype)
    pred_st_ed = nn.mlp_layer(params["head"]["st_ed_pred_head"], st_pooled,
                              dtype)                       # (Nv, F, 2)
    st_logits = nn.mask_logits(pred_st_ed[:, :, 0].astype(jnp.float32),
                               video_masks[:, 0])
    ed_logits = nn.mask_logits(pred_st_ed[:, :, 1].astype(jnp.float32),
                               video_masks[:, 0])
    logits = nn.mlp_layer(params["head"]["qa_pred_head"], qa_pooled,
                          dtype)[..., 0].astype(jnp.float32)  # (Nv, A)

    if not compute_loss:
        return logits
    targets = batch["targets"].reshape(Nv)
    ts = batch["ts_targets"].reshape(Nv, 2)
    st_s, st_n = backbone.masked_cross_entropy(st_logits, ts[:, 0])
    ed_s, ed_n = backbone.masked_cross_entropy(ed_logits, ts[:, 1])
    temporal_loss = (st_s / jnp.maximum(st_n, 1.0)
                     + ed_s / jnp.maximum(ed_n, 1.0)) / 2.0
    qa_s, qa_n = backbone.masked_cross_entropy(logits, targets)
    qa_loss = qa_s / jnp.maximum(qa_n, 1.0)
    return qa_loss, temporal_loss
