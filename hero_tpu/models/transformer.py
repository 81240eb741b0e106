"""Transformer encoder/decoder stacks.

Functional re-design of HERO's BERT/RoBERTa blocks (reference
``model/layers.py:96-360`` and the TVC decoder ``model/tvc.py:68-193``):

- post-LN residual wiring identical to the reference (attn → dense+LN
  residual, FFN → dense+LN residual);
- the layer stack is stored as *stacked* parameters (leading layer axis) and
  executed with ``jax.lax.scan`` — one compiled layer body regardless of
  depth, which keeps XLA compile time flat and lets the whole stack live in
  one fusion region;
- attention runs through the Pallas fused kernel
  (:func:`hero_tpu.ops.attention.multi_head_attention`) on TPU;
- the TVC decoder gains an incremental KV-cache decode path the reference
  lacks (it re-runs the full decoder per generated token,
  ``model/tvc.py:301-330``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from hero_tpu.config.model_config import TransformerConfig
from hero_tpu.models import nn
from hero_tpu.ops.attention import multi_head_attention, packed_attention

Params = Dict[str, Any]

UNROLL = True

# Global remat default, consulted at trace time by :func:`encoder` (set it
# BEFORE the train step is jit-traced).  A module flag instead of threading
# a kwarg through every model entry point: the choice is a whole-run
# training policy (like the bf16 policy), not a per-call argument.
_REMAT_DEFAULT = False


def set_remat(enabled: bool) -> None:
    """Enable layer rematerialization for subsequently-traced encoders."""
    global _REMAT_DEFAULT
    _REMAT_DEFAULT = bool(enabled)


def _split_heads(x: jax.Array, n_heads: int) -> jax.Array:
    B, L, D = x.shape
    return x.reshape(B, L, n_heads, D // n_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    B, H, L, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, L, H * d)


# ---------------------------------------------------------------------------
# attention block (reference BertAttention = BertSelfAttention+BertSelfOutput)
# ---------------------------------------------------------------------------

def init_attention(rng, cfg: TransformerConfig) -> Params:
    rq, rk, rv, ro = jax.random.split(rng, 4)
    D = cfg.hidden_size
    return {
        "query": nn.init_linear(rq, D, D, std=cfg.initializer_range),
        "key": nn.init_linear(rk, D, D, std=cfg.initializer_range),
        "value": nn.init_linear(rv, D, D, std=cfg.initializer_range),
        "out": nn.init_linear(ro, D, D, std=cfg.initializer_range),
        "out_ln": nn.init_layer_norm(D),
    }


def attention(p: Params, x: jax.Array, kv_mask: Optional[jax.Array],
              cfg: TransformerConfig, *, kv: Optional[jax.Array] = None,
              causal: bool = False, rng: Optional[jax.Array] = None,
              train: bool = False, dtype=jnp.float32) -> jax.Array:
    """Self- (kv=None) or cross-attention plus the output projection,
    dropout and residual LayerNorm."""
    src = x if kv is None else kv
    H = cfg.num_attention_heads
    if kv is None:
        # fused QKV: one (D, 3D) matmul instead of three (D, D) ones
        wqkv = jnp.concatenate([p["query"]["kernel"], p["key"]["kernel"],
                                p["value"]["kernel"]], axis=1)
        bqkv = jnp.concatenate([p["query"]["bias"], p["key"]["bias"],
                                p["value"]["bias"]])
        qkv = nn.linear({"kernel": wqkv, "bias": bqkv}, x, dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = nn.linear(p["query"], x, dtype)
        k = nn.linear(p["key"], src, dtype)
        v = nn.linear(p["value"], src, dtype)
    arate = cfg.attention_probs_dropout_prob if train else 0.0
    # packed layout end-to-end: no (B,L,HD) <-> (B,H,L,d) transposes
    ctx = packed_attention(
        q, k, v, H, kv_mask, dropout_rate=arate,
        dropout_rng=nn.rng_for(rng, "attn_probs"), causal=causal)
    y = nn.linear(p["out"], ctx, dtype)
    y = nn.dropout(y, cfg.hidden_dropout_prob if train else 0.0,
                   nn.rng_for(rng, "attn_out"))
    return nn.apply_layer_norm(p["out_ln"], y + x, cfg.layer_norm_eps)


# ---------------------------------------------------------------------------
# FFN block (BertIntermediate + BertOutput)
# ---------------------------------------------------------------------------

def init_ffn(rng, cfg: TransformerConfig) -> Params:
    r1, r2 = jax.random.split(rng)
    return {
        "intermediate": nn.init_linear(r1, cfg.hidden_size,
                                       cfg.intermediate_size,
                                       std=cfg.initializer_range),
        "output": nn.init_linear(r2, cfg.intermediate_size, cfg.hidden_size,
                                 std=cfg.initializer_range),
        "ln": nn.init_layer_norm(cfg.hidden_size),
    }


def ffn(p: Params, x: jax.Array, cfg: TransformerConfig, *,
        rng: Optional[jax.Array] = None, train: bool = False,
        dtype=jnp.float32) -> jax.Array:
    act = nn.ACT2FN[cfg.hidden_act]
    h = act(nn.linear(p["intermediate"], x, dtype))
    h = nn.linear(p["output"], h, dtype)
    h = nn.dropout(h, cfg.hidden_dropout_prob if train else 0.0,
                   nn.rng_for(rng, "ffn"))
    return nn.apply_layer_norm(p["ln"], h + x, cfg.layer_norm_eps)


# ---------------------------------------------------------------------------
# encoder layer + scanned stack
# ---------------------------------------------------------------------------

def init_encoder_layer(rng, cfg: TransformerConfig) -> Params:
    r1, r2 = jax.random.split(rng)
    return {"attention": init_attention(r1, cfg), "ffn": init_ffn(r2, cfg)}


def encoder_layer(p: Params, x: jax.Array, kv_mask: Optional[jax.Array],
                  cfg: TransformerConfig, *, rng=None, train=False,
                  dtype=jnp.float32) -> jax.Array:
    x = attention(p["attention"], x, kv_mask, cfg, rng=nn.rng_for(rng, "a"),
                  train=train, dtype=dtype)
    return ffn(p["ffn"], x, cfg, rng=nn.rng_for(rng, "f"), train=train,
               dtype=dtype)


def init_encoder(rng, cfg: TransformerConfig) -> Params:
    """Stacked layer params with a leading ``num_hidden_layers`` axis."""
    if cfg.num_hidden_layers == 0:
        return {"layers": {}}
    keys = jax.random.split(rng, cfg.num_hidden_layers)
    layers = jax.vmap(lambda k: init_encoder_layer(k, cfg))(keys)
    return {"layers": layers}


def encoder(p: Params, x: jax.Array, mask: Optional[jax.Array],
            cfg: TransformerConfig, *, rng: Optional[jax.Array] = None,
            train: bool = False, dtype=jnp.float32,
            remat: bool = False) -> jax.Array:
    """BertEncoder: scan one layer body over stacked params.

    ``remat``: rematerialize each layer in the backward pass.  The step is
    HBM-bound (~26 GB traffic vs ~1 TFLOP compute at recipe sizes), so
    recomputing the FFN intermediates and attention probs instead of
    saving them trades cheap MXU flops for the dominant memory traffic.
    """
    L = cfg.num_hidden_layers
    if L == 0:
        return x
    remat = remat or _REMAT_DEFAULT
    # NOTE: padding the token dim to the attention kernel's 64 granularity
    # once around the whole stack was measured SLOWER on v5e than the
    # per-call pads inside packed_attention (the padded rows then pay the
    # FFN/QKV matmuls every layer: +14% rows at L=56 costs more than the
    # pad/slice passes save) — keep padding local to the kernel wrapper.
    if rng is not None and train:
        keys = jax.random.split(rng, L)
        use_rng = True
    else:
        keys = jnp.zeros((L, 2), jnp.uint32)
        use_rng = False

    from hero_tpu.parallel import pipeline as _pp
    if _pp.active(L) and _pp.compatible(x.shape[0]):
        # GPipe over the 'stage' mesh axis (parallel/pipeline.py): the
        # stacked layer axis is already the pipeline-stage axis
        return _pp.pipelined_encoder(p["layers"], keys, use_rng, x, mask,
                                     cfg, train=train, dtype=dtype,
                                     remat=remat)

    def body(h, xs):
        layer_p, key = xs
        h = encoder_layer(layer_p, h, mask, cfg,
                          rng=key if use_rng else None, train=train,
                          dtype=dtype)
        return h, None

    if remat and train:
        body = jax.checkpoint(
            body, prevent_cse=False,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    x, _ = jax.lax.scan(body, x, (p["layers"], keys), unroll=UNROLL)
    return x


# ---------------------------------------------------------------------------
# pooler + LM head
# ---------------------------------------------------------------------------

def init_pooler(rng, cfg: TransformerConfig) -> Params:
    return {"dense": nn.init_linear(rng, cfg.hidden_size, cfg.hidden_size,
                                    std=cfg.initializer_range)}


def pooler(p: Params, x: jax.Array, dtype=jnp.float32) -> jax.Array:
    """tanh(dense(first token)) (reference model/layers.py:275-287)."""
    return jnp.tanh(nn.linear(p["dense"], x[:, 0], dtype))


def init_lm_head(rng, cfg: TransformerConfig, vocab_size: int) -> Params:
    """Tied LM head: dense → act → LN → (·) @ word_embᵀ + bias
    (reference model/layers.py:330-354; decoder weight shared with the word
    embedding, so only dense/LN/bias live here)."""
    return {
        "dense": nn.init_linear(rng, cfg.hidden_size, cfg.hidden_size,
                                std=cfg.initializer_range),
        "ln": nn.init_layer_norm(cfg.hidden_size),
        "bias": jnp.zeros((vocab_size,), jnp.float32),
    }


def lm_head(p: Params, word_emb: jax.Array, x: jax.Array,
            cfg: TransformerConfig, dtype=jnp.float32) -> jax.Array:
    act = nn.ACT2FN[cfg.hidden_act]
    h = act(nn.linear(p["dense"], x, dtype))
    h = nn.apply_layer_norm(p["ln"], h)
    # logits stay in the MODEL dtype: the reference computes this head in
    # apex-fp16 under AMP O2 (model/layers.py:16-44), and an f32 output
    # here materializes a 1.2 GB (N, M, vocab) fp32 tensor the MLM
    # fwd+bwd then stream repeatedly (~4 ms/step measured at the bench
    # shape).  masked_cross_entropy converts per-element inside its
    # fused reductions; accumulation is fp32 either way.
    logits = jnp.dot(h.astype(dtype), word_emb.astype(dtype).T,
                     preferred_element_type=dtype)
    return logits + p["bias"].astype(dtype)


# ---------------------------------------------------------------------------
# decoder layer + stack (TVC) with optional KV cache
# ---------------------------------------------------------------------------

def init_decoder_layer(rng, cfg: TransformerConfig) -> Params:
    r1, r2, r3 = jax.random.split(rng, 3)
    return {"self_attention": init_attention(r1, cfg),
            "cross_attention": init_attention(r2, cfg),
            "ffn": init_ffn(r3, cfg)}


def init_decoder(rng, cfg: TransformerConfig) -> Params:
    keys = jax.random.split(rng, cfg.num_hidden_layers)
    layers = jax.vmap(lambda k: init_decoder_layer(k, cfg))(keys)
    return {"layers": layers}


def decoder(p: Params, x: jax.Array, enc_out: jax.Array,
            enc_mask: jax.Array, cfg: TransformerConfig, *,
            self_mask: Optional[jax.Array] = None,
            rng: Optional[jax.Array] = None, train: bool = False,
            dtype=jnp.float32) -> jax.Array:
    """Full-sequence decoder (training / teacher-forced scoring).

    Causal self-attention + cross-attention over ``enc_out``; mirrors
    reference ``BertDecoderLayer.forward`` (model/tvc.py:107-154).
    """
    L = cfg.num_hidden_layers
    if rng is not None and train:
        keys = jax.random.split(rng, L)
        use_rng = True
    else:
        keys = jnp.zeros((L, 2), jnp.uint32)
        use_rng = False

    def body(h, xs):
        layer_p, key = xs
        key = key if use_rng else None
        h = attention(layer_p["self_attention"], h, self_mask, cfg,
                      causal=True, rng=nn.rng_for(key, "sa"), train=train,
                      dtype=dtype)
        h = attention(layer_p["cross_attention"], h, enc_mask, cfg,
                      kv=enc_out, rng=nn.rng_for(key, "ca"), train=train,
                      dtype=dtype)
        h = ffn(layer_p["ffn"], h, cfg, rng=nn.rng_for(key, "f"),
                train=train, dtype=dtype)
        return h, None

    x, _ = jax.lax.scan(body, x, (p["layers"], keys))
    return x


def decoder_step(p: Params, x: jax.Array, cache: Dict[str, jax.Array],
                 step: jax.Array, enc_out: jax.Array, enc_mask: jax.Array,
                 cfg: TransformerConfig, dtype=jnp.float32
                 ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One incremental decode step with a KV cache.

    ``x``: (B, 1, D) current-token embedding; ``cache``: {"k","v"} of shape
    (layers, B, H, T, d) holding self-attention keys/values for steps < step.
    Returns (output (B, 1, D), updated cache).  New capability vs. the
    reference (which re-runs the whole decoder each step).
    """
    H = cfg.num_attention_heads
    T = cache["k"].shape[3]
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    self_mask = (pos <= step).astype(jnp.float32)  # (1, T) valid ≤ step

    def body(carry, xs):
        h, step_ = carry
        layer_p, k_cache, v_cache, idx = xs
        ap = layer_p["self_attention"]
        q = _split_heads(nn.linear(ap["query"], h, dtype), H)
        k_new = _split_heads(nn.linear(ap["key"], h, dtype), H)
        v_new = _split_heads(nn.linear(ap["value"], h, dtype), H)
        k_cache = jax.lax.dynamic_update_slice_in_dim(
            k_cache, k_new.astype(k_cache.dtype), step_, axis=2)
        v_cache = jax.lax.dynamic_update_slice_in_dim(
            v_cache, v_new.astype(v_cache.dtype), step_, axis=2)
        ctx = multi_head_attention(q, k_cache.astype(dtype),
                                   v_cache.astype(dtype),
                                   jnp.broadcast_to(self_mask,
                                                    (h.shape[0], T)),
                                   use_pallas=False)
        y = nn.linear(ap["out"], _merge_heads(ctx), dtype)
        h = nn.apply_layer_norm(ap["out_ln"], y + h, cfg.layer_norm_eps)
        h = attention(layer_p["cross_attention"], h, enc_mask, cfg,
                      kv=enc_out, dtype=dtype)
        h = ffn(layer_p["ffn"], h, cfg, dtype=dtype)
        return (h, step_), (k_cache, v_cache)

    idxs = jnp.arange(cfg.num_hidden_layers)
    (x, _), (new_k, new_v) = jax.lax.scan(
        body, (x, step), (p["layers"], cache["k"], cache["v"], idxs))
    return x, {"k": new_k, "v": new_v}


def init_decode_cache(cfg: TransformerConfig, batch: int, max_len: int,
                      dtype=jnp.float32) -> Dict[str, jax.Array]:
    H = cfg.num_attention_heads
    d = cfg.head_dim
    shape = (cfg.num_hidden_layers, batch, H, max_len, d)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
