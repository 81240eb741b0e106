"""HeroForVcmr / HeroForVr — moment-retrieval and video-retrieval heads.

Thin dispatch over the VSM machinery (reference ``model/vcmr.py`` /
``model/vr.py``): training reuses :func:`hero_tpu.models.pretrain.forward_vsm`
verbatim; inference adds :func:`get_pred_from_raw_query`, the two-phase
corpus-eval scorer (query → all videos cross span logits + video-level
cosine ranking, reference ``model/vcmr.py:37-56``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from hero_tpu.config.model_config import HeroConfig
from hero_tpu.models import pretrain
from hero_tpu.models.pretrain import VsmConfig

Params = Dict[str, Any]

VCMR_TASKS = ("tvr", "how2r", "didemo_video_sub", "didemo_video_only")
VR_TASKS = ("msrvtt_video_sub", "msrvtt_video_only")

init_hero_for_vcmr = pretrain.init_hero_for_pretraining


def forward_vcmr(params: Params, cfg: HeroConfig, vsm: VsmConfig,
                 batch: Dict[str, jax.Array], *, compute_loss: bool = True,
                 rng=None, train=False, dtype=jnp.float32, **vsm_kw):
    """VCMR finetune forward = VSM forward (reference model/vcmr.py:29-35)."""
    return pretrain.forward_vsm(params, cfg, vsm, batch,
                                compute_loss=compute_loss, rng=rng,
                                train=train, dtype=dtype, **vsm_kw)


def forward_vr(params: Params, cfg: HeroConfig, vsm: VsmConfig,
               batch: Dict[str, jax.Array], *, compute_loss: bool = True,
               rng=None, train=False, dtype=jnp.float32, **vsm_kw):
    """VR = VCMR without span loss (reference model/vr.py:12-45):
    lw_st_ed must be 0; returns (loss_neg_ctx, loss_neg_q)."""
    assert vsm.lw_st_ed == 0, "For VR, lw_st_ed should be 0"
    assert vsm.lw_neg_ctx != 0 or vsm.lw_neg_q != 0
    out = pretrain.forward_vsm(params, cfg, vsm, batch,
                               compute_loss=compute_loss,
                               compute_st_ed=False, rng=rng, train=train,
                               dtype=dtype, **vsm_kw)
    if compute_loss:
        _, loss_neg_ctx, loss_neg_q = out
        return loss_neg_ctx, loss_neg_q
    scores, _, _ = out
    return scores


def encode_video_corpus(params: Params, cfg: HeroConfig,
                        batch: Dict[str, jax.Array],
                        dtype=jnp.float32) -> jax.Array:
    """Phase-1 corpus embedding: backbone 'repr' on a video batch
    (reference eval_vcmr.py:165-203).  Returns (Nv, F, D)."""
    from hero_tpu.models import model as backbone
    return backbone.forward_repr(params["v_encoder"], cfg, batch,
                                 dtype=dtype)


def get_pred_from_raw_query(params: Params, cfg: HeroConfig,
                            vsm: VsmConfig,
                            frame_embeddings: jax.Array,
                            c_attn_masks: jax.Array,
                            query_input_ids: jax.Array,
                            query_attn_masks: jax.Array, *,
                            cross: bool = True, dtype=jnp.float32
                            ) -> Tuple[Optional[jax.Array], jax.Array,
                                       jax.Array]:
    """Phase-2 query scoring against a (sub-)corpus of video embeddings.

    frame_embeddings (Nv, F, D); queries (Nq, Lq).  Returns
    (q2video_scores (Nq, Nv) or None, st_logits, ed_logits) where the span
    logits are (Nq, Nv, F) in cross mode (reference model/vcmr.py:37-56).
    """
    mod_query = pretrain.encode_query(params, cfg, query_input_ids,
                                      query_attn_masks, dtype=dtype)
    st, ed = pretrain.get_st_ed_logits(
        params["head"], mod_query, frame_embeddings,
        c_attn_masks.astype(jnp.float32), cross=cross)
    scores = None
    if vsm.lw_neg_ctx != 0 or vsm.lw_neg_q != 0:
        scores = pretrain.get_video_level_scores(
            mod_query, frame_embeddings, c_attn_masks.astype(jnp.float32))
    return scores, st, ed


def get_vr_scores_from_raw_query(params: Params, cfg: HeroConfig,
                                 frame_embeddings: jax.Array,
                                 c_attn_masks: jax.Array,
                                 query_input_ids: jax.Array,
                                 query_attn_masks: jax.Array,
                                 dtype=jnp.float32) -> jax.Array:
    """VR inference: video-level scores only (reference model/vr.py:46-56)."""
    mod_query = pretrain.encode_query(params, cfg, query_input_ids,
                                      query_attn_masks, dtype=dtype)
    return pretrain.get_video_level_scores(
        mod_query, frame_embeddings, c_attn_masks.astype(jnp.float32))
