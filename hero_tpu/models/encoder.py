"""Cross-modal and temporal encoders — the two HERO stages, fixed-shape.

Re-design of reference ``model/encoder.py`` for TPU/XLA:

The reference packs each subtitle's ``[matched frames ; sub tokens]`` into a
ragged compact sequence via a ``gather_index`` built per batch
(``encoder.py:256-285``, ``data/data.py:504-512``).  Here every sub row has a
*fixed* layout ``[Fs frame slots ; Lt text slots]`` with per-slot validity
masks — attention with a padding mask is equivalent to the compact layout,
every step compiles once, and there is no host-side gather-index
construction.  Position ids match the reference collates: frames get
``arange(Fs)``, text gets ``arange(Lt)`` clamped at 511
(``data/data.py:421-436``); both modalities receive token-type embedding 1
(``encoder.py:244-253``, ``init_type_embedding`` copies row 0 into row 1).

Modes (reference ``CrossModalTrm.forward`` encoder.py:297-334):
- :func:`cross_modal_repr`  — fused sub+frames ('repr')
- :func:`cross_modal_txt`   — text-only query/caption ('txt')
- :func:`cross_modal_mlm`   — 'repr' + masked-position LM logits ('mlm'),
  with the masked-only efficiency trick re-expressed as a fixed-width gather
  of ``max_masked`` positions per row instead of a dynamic boolean select
  (``encoder.py:376-389``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from hero_tpu.config.model_config import TransformerConfig
from hero_tpu.models import embed, nn, transformer

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# CrossModalTrm (f_encoder)
# ---------------------------------------------------------------------------

def init_cross_modal_trm(rng, cfg: TransformerConfig, vfeat_dim: int,
                         max_img_seq_len: int) -> Params:
    r1, r2, r3, r4, r5 = jax.random.split(rng, 5)
    return {
        "embeddings": embed.init_sub_embeddings(r1, cfg),
        "img_embeddings": embed.init_image_embeddings(
            r2, cfg, vfeat_dim, max_img_seq_len),
        "encoder": transformer.init_encoder(r3, cfg),
        "pooler": transformer.init_pooler(r4, cfg),
        "lm_head": transformer.init_lm_head(r5, cfg, cfg.vocab_size),
    }


def _img_type_embedding(p: Params, dtype) -> jax.Array:
    """Type embedding for frame tokens: index 1 (or 0 if single-type)."""
    table = p["embeddings"]["type_emb"]
    return table[min(1, table.shape[0] - 1)].astype(dtype)


def _fused_embeddings(p: Params, cfg: TransformerConfig,
                      sub_input_ids, txt_mask, v_feats, v_mask,
                      img_masks=None, v_feats_projected=False,
                      packed=None, rng=None, train=False, dtype=jnp.float32
                      ) -> Tuple[jax.Array, jax.Array]:
    """Embed ``[frames ; text]`` rows. Returns (hidden (N, Fs+Lt, D), attention
    mask (N, Fs+Lt)).

    ``packed``: sub-packing extras (hero_tpu/data/packing.py) — a dict
    with ``txt_seg``/``frame_seg`` (segment ids, -1 = invalid slot) and
    ``txt_pos``/``frame_pos`` (per-segment-restarting position ids), all
    (N, L*).  When given, position embeddings follow the per-segment ids
    and the returned mask is the (N, Fs+Lt, PACK_MAX_SEGS) segment
    one-hot the attention kernel turns into a block-diagonal bias.
    """
    txt_emb = embed.sub_embeddings(
        p["embeddings"], sub_input_ids,
        position_ids=None if packed is None else packed["txt_pos"],
        cfg=cfg, rng=nn.rng_for(rng, "txt"), train=train, dtype=dtype)
    img_emb = embed.image_embeddings(
        p["img_embeddings"], v_feats, _img_type_embedding(p, dtype),
        img_pos_ids=None if packed is None else packed["frame_pos"],
        img_masks=img_masks, cfg=cfg, projected=v_feats_projected,
        rng=nn.rng_for(rng, "img"), train=train, dtype=dtype)
    hidden = jnp.concatenate([img_emb, txt_emb], axis=1)
    if packed is not None:
        from hero_tpu.const import PACK_MAX_SEGS
        seg_ids = jnp.concatenate([packed["frame_seg"], packed["txt_seg"]],
                                  axis=1)
        mask = jax.nn.one_hot(seg_ids, PACK_MAX_SEGS, dtype=dtype)
    else:
        mask = jnp.concatenate([v_mask, txt_mask],
                               axis=1).astype(jnp.float32)
    return hidden, mask


def cross_modal_repr(p: Params, cfg: TransformerConfig,
                     sub_input_ids: jax.Array, txt_mask: jax.Array,
                     v_feats: jax.Array, v_mask: jax.Array,
                     img_masks: Optional[jax.Array] = None, *,
                     v_feats_projected: bool = False, packed=None,
                     rng=None, train=False, dtype=jnp.float32) -> jax.Array:
    """Fused encoding ('repr').  Returns (N, Fs+Lt, D): first Fs positions
    are the per-sub frame outputs, rest are subtitle token outputs.
    ``v_feats_projected``: v_feats already passed through
    :func:`embed.project_image_features` (clip-level projection).
    ``packed``: sub-packing extras (see :func:`_fused_embeddings`)."""
    hidden, mask = _fused_embeddings(
        p, cfg, sub_input_ids, txt_mask, v_feats, v_mask, img_masks,
        v_feats_projected=v_feats_projected, packed=packed, rng=rng,
        train=train, dtype=dtype)
    return transformer.encoder(p["encoder"], hidden, mask, cfg,
                               rng=nn.rng_for(rng, "enc"), train=train,
                               dtype=dtype)


def cross_modal_txt(p: Params, cfg: TransformerConfig,
                    input_ids: jax.Array, mask: jax.Array, *,
                    position_ids: Optional[jax.Array] = None,
                    rng=None, train=False, dtype=jnp.float32) -> jax.Array:
    """Text-only encoding ('txt') for queries/captions."""
    hidden = embed.sub_embeddings(
        p["embeddings"], input_ids, position_ids=position_ids, cfg=cfg,
        rng=nn.rng_for(rng, "txt"), train=train, dtype=dtype)
    return transformer.encoder(p["encoder"], hidden,
                               mask.astype(jnp.float32), cfg,
                               rng=nn.rng_for(rng, "enc"), train=train,
                               dtype=dtype)


def cross_modal_mlm(p: Params, cfg: TransformerConfig,
                    sub_input_ids: jax.Array, txt_mask: jax.Array,
                    v_feats: jax.Array, v_mask: jax.Array,
                    mask_pos: jax.Array, *, vocab_pad: int = 0,
                    packed=None, rng=None, train=False,
                    dtype=jnp.float32) -> jax.Array:
    """MLM logits at masked text positions.

    ``mask_pos``: (N, M) indices into the *text* portion (0..Lt-1), padded
    arbitrarily (loss masks them via label -1).  Returns (N, M, vocab).
    """
    seq = cross_modal_repr(p, cfg, sub_input_ids, txt_mask, v_feats, v_mask,
                           packed=packed, rng=rng, train=train, dtype=dtype)
    Fs = v_feats.shape[1]
    txt_hidden = seq[:, Fs:]                          # (N, Lt, D)
    picked = jnp.take_along_axis(txt_hidden, mask_pos[..., None], axis=1)
    logits = transformer.lm_head(p["lm_head"],
                                 p["embeddings"]["word_emb"], picked, cfg,
                                 dtype=dtype)
    if vocab_pad:
        logits = logits[..., :-vocab_pad]
    return logits


def cross_modal_pooled(p: Params, seq_out: jax.Array,
                       dtype=jnp.float32) -> jax.Array:
    return transformer.pooler(p["pooler"], seq_out, dtype)


# ---------------------------------------------------------------------------
# TemporalTrm (c_encoder)
# ---------------------------------------------------------------------------

def init_temporal_trm(rng, cfg: TransformerConfig) -> Params:
    r1, r2, r3 = jax.random.split(rng, 3)
    return {
        "embeddings": embed.init_frame_embeddings(r1, cfg),
        "encoder": transformer.init_encoder(r2, cfg),
        "pooler": transformer.init_pooler(r3, cfg),
    }


def temporal_trm(p: Params, cfg: TransformerConfig,
                 frame_feat: jax.Array, attn_mask: jax.Array, *,
                 position_ids: Optional[jax.Array] = None,
                 pool: bool = False, rng=None, train=False,
                 dtype=jnp.float32) -> jax.Array:
    """Clip-level temporal encoding (reference encoder.py:392-423)."""
    hidden = embed.frame_embeddings(
        p["embeddings"], frame_feat, position_ids=position_ids, cfg=cfg,
        rng=nn.rng_for(rng, "emb"), train=train, dtype=dtype)
    out = transformer.encoder(p["encoder"], hidden,
                              attn_mask.astype(jnp.float32), cfg,
                              rng=nn.rng_for(rng, "enc"), train=train,
                              dtype=dtype)
    if pool:
        return transformer.pooler(p["pooler"], out, dtype)
    return out


# ---------------------------------------------------------------------------
# QueryFeatEncoder
# ---------------------------------------------------------------------------

def init_query_feat_encoder(rng, cfg: TransformerConfig, qfeat_dim: int,
                            modularized: bool = True) -> Params:
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    p = {
        "query_input_proj": nn.init_linear_layer(r1, qfeat_dim,
                                                 cfg.hidden_size),
        "pos_embed": embed.init_query_feat_embeddings(r2, cfg),
        "attention": transformer.init_attention(r3, cfg),
    }
    if modularized:
        p["modular_vector"] = nn.init_linear(r4, cfg.hidden_size, 1,
                                             bias=False,
                                             std=cfg.initializer_range)
    return p


def get_modularized_queries(p: Params, query: jax.Array,
                            query_mask: jax.Array,
                            dtype=jnp.float32) -> jax.Array:
    """Softmax-weighted pooling over token positions
    (reference encoder.py:442-463). query: (N, L, D) → (N, D)."""
    scores = nn.linear(p["modular_vector"], query, dtype)       # (N, L, 1)
    scores = nn.mask_logits(scores, query_mask[..., None])
    att = jax.nn.softmax(scores.astype(jnp.float32), axis=1).astype(dtype)
    return jnp.einsum("blm,bld->bmd", att, query)[:, 0]


def query_feat_encoder_packed(p: Params, cfg: TransformerConfig,
                              query_feat: jax.Array, seg_onehot: jax.Array,
                              position_ids: jax.Array,
                              dtype=jnp.float32) -> jax.Array:
    """Packed variant of :func:`query_feat_encoder`: several queries share
    one row behind the block-diagonal segment mask (serve phase-2 packing;
    the reference runs one row per query, encoder.py:426-485).

    query_feat (R, L, qdim), seg_onehot (R, L, S) (all-zero = pad slot),
    position_ids (R, L) restarting at each segment.  Returns (R, S, D)
    per-segment modular-pooled vectors; pad segments yield garbage rows
    the caller must not gather.
    """
    h = nn.linear_layer(p["query_input_proj"], query_feat, relu=True,
                        dtype=dtype)
    h = embed.query_feat_embeddings(p["pos_embed"], h,
                                    position_ids=position_ids, cfg=cfg,
                                    dtype=dtype)
    h = transformer.attention(p["attention"], h,
                              seg_onehot.astype(jnp.float32), cfg,
                              dtype=dtype)
    # per-segment modular pooling: same softmax-weighted sum as
    # get_modularized_queries, restricted to each segment's slots
    scores = nn.linear(p["modular_vector"], h, dtype)[..., 0]     # (R, L)
    slog = nn.mask_logits(scores[:, None, :],
                          seg_onehot.transpose(0, 2, 1))          # (R, S, L)
    att = jax.nn.softmax(slog.astype(jnp.float32), axis=-1).astype(dtype)
    return jnp.einsum("rsl,rld->rsd", att, h)


def query_feat_encoder(p: Params, cfg: TransformerConfig,
                       query_feat: jax.Array, query_mask: jax.Array, *,
                       rng=None, train=False, dtype=jnp.float32) -> jax.Array:
    """Project → position-embed → 1 self-attention block → modular pooling
    (reference encoder.py:426-485).  query_feat: (N, L, qdim) → (N, D)."""
    h = nn.linear_layer(p["query_input_proj"], query_feat, relu=True,
                        dropout_rate=cfg.hidden_dropout_prob if train else 0.0,
                        rng=nn.rng_for(rng, "proj"), dtype=dtype)
    h = embed.query_feat_embeddings(p["pos_embed"], h, cfg=cfg,
                                    rng=nn.rng_for(rng, "pos"), train=train,
                                    dtype=dtype)
    h = transformer.attention(p["attention"], h,
                              query_mask.astype(jnp.float32), cfg,
                              rng=nn.rng_for(rng, "attn"), train=train,
                              dtype=dtype)
    if "modular_vector" in p:
        return get_modularized_queries(p, h, query_mask, dtype)
    return h
