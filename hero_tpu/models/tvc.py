"""HeroForTvc — TV-show caption generation.

Re-design of reference ``model/tvc.py:196-338``:

- ``encode``: backbone 'repr' then per-caption clip-segment slicing.  The
  reference slices with a python loop over ``clip_ranges`` and re-pads
  (``tvc.py:219-238``); here the pipeline emits fixed-shape gather indices
  (``cap_vidx`` (Ncap,), ``seg_idx``/``seg_mask`` (Ncap, Lv)) and the slice
  is a vectorized two-level gather.
- ``decode``: shared word embedding + decoder position embedding + LN →
  2-layer causal/cross decoder → shared tied LM head (``tvc.py:240-266``).
- :func:`greedy_decode`: **KV-cached incremental decoding inside one jit**
  — the reference re-runs the full decoder every step and notes the missing
  cache (``tvc.py:301-330``); beam search is likewise available
  (:func:`beam_decode`), a capability the reference lacks.

Batch extras: ``cap_input_ids`` (Ncap, Lt) BOS-shifted, ``cap_tgt_ids``
(Ncap, Lt) labels (-1 ignored), plus the gather indices above.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from hero_tpu.config.model_config import HeroConfig
from hero_tpu.models import model as backbone
from hero_tpu.models import nn, transformer

Params = Dict[str, Any]


def init_hero_for_tvc(rng, cfg: HeroConfig) -> Params:
    assert cfg.d_config is not None, "TVC needs a d_config"
    r1, r2, r3 = jax.random.split(rng, 3)
    return {
        "v_encoder": backbone.init_hierarchical_vl_model(r1, cfg),
        "position_embeddings": nn.init_embedding(
            r2, cfg.d_config.max_position_embeddings,
            cfg.d_config.hidden_size,
            std=cfg.d_config.initializer_range),
        "emb_ln": nn.init_layer_norm(cfg.d_config.hidden_size),
        "decoder": transformer.init_decoder(r3, cfg.d_config),
    }


def encode(params: Params, cfg: HeroConfig, batch: Dict[str, jax.Array], *,
           rng=None, train=False, dtype=jnp.float32) -> jax.Array:
    """Clip-segment encoder outputs per caption: (Ncap, Lv, D)."""
    frame_emb = backbone.forward_repr(params["v_encoder"], cfg, batch,
                                      rng=nn.rng_for(rng, "repr"),
                                      train=train, dtype=dtype)  # (B, F, D)
    per_cap = frame_emb[batch["cap_vidx"]]                 # (Ncap, F, D)
    seg = jnp.take_along_axis(per_cap, batch["seg_idx"][..., None], axis=1)
    return seg * batch["seg_mask"][..., None].astype(seg.dtype)


def _embed_captions(params: Params, cfg: HeroConfig, caption_ids, pos_ids,
                    dtype=jnp.float32) -> jax.Array:
    word_emb = params["v_encoder"]["f_encoder"]["embeddings"]["word_emb"]
    tok = nn.embedding_lookup(word_emb, caption_ids, dtype)
    pos = nn.embedding_lookup(params["position_embeddings"], pos_ids, dtype)
    return nn.apply_layer_norm(params["emb_ln"], tok + pos)


def decode(params: Params, cfg: HeroConfig, enc_outputs: jax.Array,
           enc_masks: jax.Array, caption_ids: jax.Array, *,
           pos_ids: Optional[jax.Array] = None, rng=None, train=False,
           dtype=jnp.float32) -> jax.Array:
    """Teacher-forced decode → vocab logits (Ncap, Lt, V)."""
    Lt = caption_ids.shape[1]
    if pos_ids is None:
        pos_ids = jnp.arange(Lt, dtype=jnp.int32)
    h = _embed_captions(params, cfg, caption_ids, pos_ids, dtype)
    h = transformer.decoder(params["decoder"], h, enc_outputs,
                            enc_masks.astype(jnp.float32), cfg.d_config,
                            rng=nn.rng_for(rng, "dec"), train=train,
                            dtype=dtype)
    fenc = params["v_encoder"]["f_encoder"]
    return transformer.lm_head(fenc["lm_head"],
                               fenc["embeddings"]["word_emb"], h,
                               cfg.f_config, dtype=dtype)


def label_smoothing_loss(logits: jax.Array, targets: jax.Array,
                         label_smoothing: float,
                         ignore_index: int = -1
                         ) -> Tuple[jax.Array, jax.Array]:
    """KL(q_smooth ‖ p) per reference ``LabelSmoothingLoss``
    (model/tvc.py:19-64), returned as (sum, valid_count)."""
    V = logits.shape[-1]
    valid = targets != ignore_index
    safe = jnp.where(valid, targets, 0)
    eps = label_smoothing / (V - 1)
    conf = 1.0 - label_smoothing
    # sum_v q_v (log q_v - logp_v); q has eps everywhere, conf at target.
    # logp_v = logits_v - lse, so tgt_logp and sum_logp reduce without
    # materializing the full (..., V) fp32 log-prob tensor — the logits
    # stay in the MODEL dtype with the f32 convert inside each reduction
    # (see models/model.py streamed_lse).
    from hero_tpu.models.model import streamed_lse
    lse = streamed_lse(logits)
    tgt_logp = jnp.take_along_axis(logits, safe[..., None],
                                   axis=-1)[..., 0].astype(jnp.float32) \
        - lse
    sum_logp = jnp.sum(logits.astype(jnp.float32), axis=-1) - V * lse
    cross = -(eps * (sum_logp - tgt_logp) + conf * tgt_logp)
    import math
    q_ent = ((V - 1) * eps * math.log(eps) if eps > 0 else 0.0) \
        + conf * math.log(conf)
    loss = cross + q_ent
    loss = jnp.where(valid, loss, 0.0)
    return jnp.sum(loss), jnp.sum(valid)


def forward_tvc(params: Params, cfg: HeroConfig,
                batch: Dict[str, jax.Array], *, lsr: float = 0.1,
                compute_loss: bool = True, rng=None, train=False,
                dtype=jnp.float32):
    """Training forward (reference model/tvc.py:268-277)."""
    enc_out = encode(params, cfg, batch, rng=nn.rng_for(rng, "enc"),
                     train=train, dtype=dtype)
    logits = decode(params, cfg, enc_out, batch["seg_mask"],
                    batch["cap_input_ids"], rng=nn.rng_for(rng, "dec"),
                    train=train, dtype=dtype)
    if not compute_loss:
        return logits
    if lsr > 0:
        return label_smoothing_loss(logits, batch["cap_tgt_ids"], lsr)
    return backbone.masked_cross_entropy(logits, batch["cap_tgt_ids"])


# ---------------------------------------------------------------------------
# generation
# ---------------------------------------------------------------------------

def greedy_decode(params: Params, cfg: HeroConfig,
                  batch: Dict[str, jax.Array], *, max_step: int, bos: int,
                  eos: int, dtype=jnp.float32) -> jax.Array:
    """KV-cached greedy decoding; one jit-compatible scan over steps.

    Returns generated ids (Ncap, max_step) — tokens after the first EOS are
    garbage and must be cut host-side (reference cut_eos, tvc.py:332-338).
    """
    enc_out = encode(params, cfg, batch, dtype=dtype)
    enc_mask = batch["seg_mask"].astype(jnp.float32)
    N = enc_out.shape[0]
    dcfg = cfg.d_config
    cache = transformer.init_decode_cache(dcfg, N, max_step, dtype)
    fenc = params["v_encoder"]["f_encoder"]

    def step_fn(carry, t):
        tok, cache = carry
        h = _embed_captions(params, cfg, tok[:, None],
                            t[None].astype(jnp.int32), dtype)
        h, cache = transformer.decoder_step(
            params["decoder"], h, cache, t, enc_out, enc_mask, dcfg,
            dtype=dtype)
        logits = transformer.lm_head(fenc["lm_head"],
                                     fenc["embeddings"]["word_emb"], h,
                                     cfg.f_config, dtype=dtype)
        nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        return (nxt, cache), nxt

    init_tok = jnp.full((N,), bos, jnp.int32)
    _, out = jax.lax.scan(step_fn, (init_tok, cache),
                          jnp.arange(max_step))
    return out.T                                            # (N, max_step)


def beam_decode(params: Params, cfg: HeroConfig,
                batch: Dict[str, jax.Array], *, max_step: int, bos: int,
                eos: int, beam: int = 4, length_penalty: float = 0.6,
                dtype=jnp.float32) -> jax.Array:
    """Simple length-normalized beam search (new capability; the reference
    only ships greedy).  Returns best ids (Ncap, max_step)."""
    enc_out = encode(params, cfg, batch, dtype=dtype)
    enc_mask = batch["seg_mask"].astype(jnp.float32)
    N, Lv, D = enc_out.shape
    dcfg = cfg.d_config
    # expand each caption into `beam` rows
    enc_out_b = jnp.repeat(enc_out, beam, axis=0)
    enc_mask_b = jnp.repeat(enc_mask, beam, axis=0)
    cache = transformer.init_decode_cache(dcfg, N * beam, max_step, dtype)
    fenc = params["v_encoder"]["f_encoder"]
    neg_inf = jnp.float32(-1e9)

    init_scores = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((beam - 1,), -1e9)]),
        (N,)).astype(jnp.float32)                           # (N*beam,)
    init_tok = jnp.full((N * beam,), bos, jnp.int32)
    init_done = jnp.zeros((N * beam,), jnp.bool_)
    init_seq = jnp.zeros((N * beam, max_step), jnp.int32)

    def step_fn(carry, t):
        tok, cache, scores, done, seqs = carry
        h = _embed_captions(params, cfg, tok[:, None],
                            t[None].astype(jnp.int32), dtype)
        h, cache = transformer.decoder_step(
            params["decoder"], h, cache, t, enc_out_b, enc_mask_b, dcfg,
            dtype=dtype)
        logits = transformer.lm_head(fenc["lm_head"],
                                     fenc["embeddings"]["word_emb"], h,
                                     cfg.f_config, dtype=dtype)[:, 0]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        V = logp.shape[-1]
        # finished beams only propagate EOS with 0 added score
        eos_only = jnp.full((V,), neg_inf).at[eos].set(0.0)
        logp = jnp.where(done[:, None], eos_only[None, :], logp)
        cand = scores[:, None] + logp                       # (N*beam, V)
        cand = cand.reshape(N, beam * V)
        top_scores, top_idx = jax.lax.top_k(cand, beam)     # (N, beam)
        src_beam = top_idx // V                             # (N, beam)
        next_tok = (top_idx % V).astype(jnp.int32)
        flat_src = (src_beam
                    + jnp.arange(N)[:, None] * beam).reshape(-1)
        # reorder all beam state
        new_cache = jax.tree.map(lambda c: c[:, flat_src], cache)
        seqs = seqs[flat_src]
        seqs = seqs.at[:, t].set(next_tok.reshape(-1))
        done = done[flat_src] | (next_tok.reshape(-1) == eos)
        return (next_tok.reshape(-1), new_cache,
                top_scores.reshape(-1), done, seqs), None

    (tok, cache, scores, done, seqs), _ = jax.lax.scan(
        step_fn, (init_tok, cache, init_scores, init_done, init_seq),
        jnp.arange(max_step))
    # length-penalized best beam per caption
    lengths = jnp.sum((jnp.cumsum(seqs == eos, axis=1) == 0), axis=1) + 1
    norm = scores / (lengths.astype(jnp.float32) ** length_penalty)
    best = jnp.argmax(norm.reshape(N, beam), axis=1)
    return seqs.reshape(N, beam, max_step)[jnp.arange(N), best]
