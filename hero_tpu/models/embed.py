"""Input embedding modules.

Functional equivalents of HERO's four embedders (reference
``model/embed.py``):

- :func:`sub_embeddings` — RoBERTa word + position + token-type embeddings
  for subtitle/query text (``SubEmbeddings`` embed.py:12-86).  The collates
  always pass explicit arange position ids clamped at 511
  (``data/data.py:428-429``); the padding-idx cumsum path is kept for parity
  (:func:`roberta_position_ids`).
- :func:`image_embeddings` — 4352-d frame features: LN(vfeat) → linear →
  + learned position + type embedding, then LN+dropout
  (``ImageEmbeddings`` embed.py:89-133), with the MFM mask-embedding add.
- :func:`frame_embeddings` — clip-level positions for the temporal encoder
  (``FrameEmbeddings`` embed.py:136-161).
- :func:`query_feat_embeddings` — positions over projected query features
  (``QueryFeatEmbeddings`` embed.py:164-188).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from hero_tpu.config.model_config import TransformerConfig
from hero_tpu.models import nn

Params = Dict[str, Any]

PAD_IDX = 1          # RoBERTa padding token id
MAX_POS_ID = 511     # collate clamp (reference data/data.py:429)


def roberta_position_ids(input_ids: jax.Array,
                         padding_idx: int = PAD_IDX) -> jax.Array:
    """Positions = padding_idx + cumulative count of non-pad tokens
    (reference embed.py:60-70); padded tokens keep padding_idx."""
    mask = (input_ids != padding_idx).astype(jnp.int32)
    return jnp.cumsum(mask, axis=-1) * mask + padding_idx


def init_sub_embeddings(rng, cfg: TransformerConfig) -> Params:
    r1, r2, r3 = jax.random.split(rng, 3)
    return {
        "word_emb": nn.init_embedding(r1, cfg.vocab_size, cfg.hidden_size,
                                      std=cfg.initializer_range,
                                      padding_idx=PAD_IDX),
        "pos_emb": nn.init_embedding(r2, cfg.max_position_embeddings,
                                     cfg.hidden_size,
                                     std=cfg.initializer_range),
        "type_emb": nn.init_embedding(r3, cfg.type_vocab_size,
                                      cfg.hidden_size,
                                      std=cfg.initializer_range),
        "ln": nn.init_layer_norm(cfg.hidden_size),
    }


def sub_embeddings(p: Params, input_ids: jax.Array,
                   position_ids: Optional[jax.Array] = None,
                   token_type_ids: Optional[jax.Array] = None,
                   *, cfg: TransformerConfig,
                   rng: Optional[jax.Array] = None, train: bool = False,
                   dtype=jnp.float32) -> jax.Array:
    if position_ids is None:
        position_ids = jnp.minimum(
            jnp.arange(input_ids.shape[-1], dtype=jnp.int32), MAX_POS_ID)
        position_ids = jnp.broadcast_to(position_ids, input_ids.shape)
    words = nn.embedding_lookup(p["word_emb"], input_ids, dtype)
    pos = nn.embedding_lookup(p["pos_emb"], position_ids, dtype)
    if token_type_ids is None:
        # reference default: type id 1 for all tokens (embed.py:47-50)
        type_idx = min(1, p["type_emb"].shape[0] - 1)
        types = p["type_emb"][type_idx].astype(dtype)
    else:
        types = nn.embedding_lookup(p["type_emb"], token_type_ids, dtype)
    x = words + pos + types
    x = nn.apply_layer_norm(p["ln"], x)
    return nn.dropout(x, cfg.hidden_dropout_prob if train else 0.0,
                      nn.rng_for(rng, "sub_emb"))


def init_image_embeddings(rng, cfg: TransformerConfig, img_dim: int,
                          max_img_seq_len: int) -> Params:
    r1, r2, r3 = jax.random.split(rng, 3)
    return {
        "img_ln": nn.init_layer_norm(img_dim),
        "img_linear": nn.init_linear(r1, img_dim, cfg.hidden_size,
                                     std=cfg.initializer_range),
        "pos_emb": nn.init_embedding(r2, max_img_seq_len, cfg.hidden_size,
                                     std=cfg.initializer_range),
        # mask_embedding row 0 is the padding row (zeros at init)
        "mask_emb": nn.init_embedding(r3, 2, img_dim,
                                      std=cfg.initializer_range,
                                      padding_idx=0),
        "ln": nn.init_layer_norm(cfg.hidden_size),
    }


def project_image_features(p: Params, img_feat: jax.Array,
                           img_masks: Optional[jax.Array] = None,
                           *, dtype=jnp.float32) -> jax.Array:
    """The mask-add + img_ln + img_linear stage of ImageEmbeddings alone:
    (..., L, img_dim) → (..., L, D).  All three ops are row-wise, so they
    commute with frame gathers — callers may apply this ONCE per unique
    clip frame and gather D-dim rows instead of projecting every
    (sub, frame-slot) occurrence (model.py _project_and_gather)."""
    if img_masks is not None:
        mask_add = nn.embedding_lookup(p["mask_emb"],
                                       img_masks.astype(jnp.int32), dtype)
        img_feat = img_feat.astype(dtype) + mask_add
    h = nn.apply_layer_norm(p["img_ln"], img_feat.astype(dtype))
    return nn.linear(p["img_linear"], h, dtype)


def image_embeddings(p: Params, img_feat: jax.Array,
                     type_embedding: jax.Array,
                     img_pos_ids: Optional[jax.Array] = None,
                     img_masks: Optional[jax.Array] = None,
                     *, cfg: TransformerConfig, projected: bool = False,
                     rng: Optional[jax.Array] = None, train: bool = False,
                     dtype=jnp.float32) -> jax.Array:
    """img_feat: (..., L, img_dim); img_masks: (..., L) 1 = masked (MFM).
    ``projected=True``: img_feat is already the (..., L, D) output of
    :func:`project_image_features` (mask-add/ln/linear are skipped)."""
    if projected:
        h = img_feat.astype(dtype)
    else:
        h = project_image_features(p, img_feat, img_masks, dtype=dtype)
    if img_pos_ids is None:
        img_pos_ids = jnp.arange(img_feat.shape[-2], dtype=jnp.int32)
    pos = nn.embedding_lookup(p["pos_emb"], img_pos_ids, dtype)
    x = h + pos + type_embedding.astype(dtype)
    x = nn.apply_layer_norm(p["ln"], x)
    return nn.dropout(x, cfg.hidden_dropout_prob if train else 0.0,
                      nn.rng_for(rng, "img_emb"))


def init_frame_embeddings(rng, cfg: TransformerConfig) -> Params:
    return {
        "pos_emb": nn.init_embedding(rng, cfg.max_position_embeddings,
                                     cfg.hidden_size,
                                     std=cfg.initializer_range),
        "ln": nn.init_layer_norm(cfg.hidden_size),
    }


def frame_embeddings(p: Params, frame_feat: jax.Array,
                     position_ids: Optional[jax.Array] = None,
                     *, cfg: TransformerConfig,
                     rng: Optional[jax.Array] = None, train: bool = False,
                     dtype=jnp.float32) -> jax.Array:
    """frame_feat: (B, L, D) already in hidden space."""
    if position_ids is None:
        position_ids = jnp.arange(frame_feat.shape[1], dtype=jnp.int32)
    pos = nn.embedding_lookup(p["pos_emb"], position_ids, dtype)
    x = nn.apply_layer_norm(p["ln"], frame_feat.astype(dtype) + pos)
    return nn.dropout(x, cfg.hidden_dropout_prob if train else 0.0,
                      nn.rng_for(rng, "frame_emb"))


def init_query_feat_embeddings(rng, cfg: TransformerConfig) -> Params:
    return {
        "pos_emb": nn.init_embedding(rng, cfg.max_position_embeddings,
                                     cfg.hidden_size,
                                     std=cfg.initializer_range),
        "ln": nn.init_layer_norm(cfg.hidden_size),
    }


def query_feat_embeddings(p: Params, input_feat: jax.Array,
                          position_ids: Optional[jax.Array] = None,
                          *, cfg: TransformerConfig,
                          rng: Optional[jax.Array] = None,
                          train: bool = False,
                          dtype=jnp.float32) -> jax.Array:
    if position_ids is None:
        position_ids = jnp.arange(input_feat.shape[1], dtype=jnp.int32)
    pos = nn.embedding_lookup(p["pos_emb"], position_ids, dtype)
    x = nn.apply_layer_norm(p["ln"], input_feat.astype(dtype) + pos)
    return nn.dropout(x, cfg.hidden_dropout_prob if train else 0.0,
                      nn.rng_for(rng, "query_emb"))
