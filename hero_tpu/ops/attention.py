"""Fused multi-head attention for TPU.

HERO's attention is short-sequence, high-count: stage-1 runs ``n_subs``
sequences of ~80-160 tokens, stage-2 runs clips of ~100 frames (reference
``model/layers.py:96-164`` materializes the full score matrix in HBM).  In
this regime a *single-block* fused kernel — the whole (L, L) score tile lives
in VMEM for one (batch, head) program — is faster than streaming
flash-attention: no online-softmax bookkeeping, one HBM round-trip for
q/k/v/out, and the MXU sees two back-to-back (L, d)x(d, L)/(L, L)x(L, d)
matmuls.  Sequences are padded to a lane-aligned length by the wrapper and
masked with the reference's additive -10000 convention
(``model/layers.py:307-310``).

Attention-probability dropout (p=0.1 in training) runs *inside* the kernel
with the TPU PRNG; the backward kernel regenerates the identical mask from
the same seed, so the custom VJP is exact.

The public entry is :func:`multi_head_attention`, which dispatches to the
Pallas kernel on TPU and to a jnp reference path elsewhere (tests force the
jnp path or interpret mode on CPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e4 * 1.0  # additive mask value, matches reference BertEncoder


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# jnp reference path (CPU tests / fallback)
# ---------------------------------------------------------------------------

def mha_reference(q: jax.Array, k: jax.Array, v: jax.Array,
                  kv_mask: Optional[jax.Array],
                  dropout_rate: float = 0.0,
                  dropout_rng: Optional[jax.Array] = None,
                  causal: bool = False) -> jax.Array:
    """q,k,v: (B, H, L, d); kv_mask: (B, Lk) 1=valid. Returns (B, H, Lq, d)."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if kv_mask is not None:
        bias = (1.0 - kv_mask.astype(jnp.float32)) * NEG_INF
        s = s + bias[:, None, None, :]
    if causal:
        Lq, Lk = q.shape[2], k.shape[2]
        row = jax.lax.broadcasted_iota(jnp.int32, (Lq, Lk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (Lq, Lk), 1)
        s = s + jnp.where(col > row + (Lk - Lq), NEG_INF, 0.0)
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, p.shape)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)
                      ).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------

def _dropout_keep_mask(shape, rate: float):
    """Uniform keep mask from the already-seeded TPU PRNG."""
    bits = pltpu.prng_random_bits(shape)  # uint32
    # top 24 bits → uniform [0, 1)
    u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
    return u >= rate


def _causal_bias(Lq: int, Lk: int):
    row = jax.lax.broadcasted_iota(jnp.int32, (Lq, Lk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Lq, Lk), 1)
    return jnp.where(col > row + (Lk - Lq), NEG_INF, 0.0)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                scale: float, dropout_rate: float, causal: bool):
    b, h = pl.program_id(0), pl.program_id(1)
    q = q_ref[0, 0].astype(jnp.float32)          # (Lq, d)
    k = k_ref[0, 0].astype(jnp.float32)          # (Lk, d)
    v = v_ref[0, 0].astype(jnp.float32)          # (Lk, d)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    bias = (1.0 - mask_ref[0]) * NEG_INF          # (1, Lk)
    s = s + bias
    if causal:
        s = s + _causal_bias(s.shape[0], s.shape[1])
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0], b * pl.num_programs(1) + h)
        keep = _dropout_keep_mask(p.shape, dropout_rate)
        p = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float,
                dropout_rate: float, causal: bool):
    b, h = pl.program_id(0), pl.program_id(1)
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    bias = (1.0 - mask_ref[0]) * NEG_INF          # (1, Lk)
    s = s + bias
    if causal:
        s = s + _causal_bias(s.shape[0], s.shape[1])
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0], b * pl.num_programs(1) + h)
        keep = _dropout_keep_mask(p.shape, dropout_rate)
        inv_keep = 1.0 / (1.0 - dropout_rate)
        pd = jnp.where(keep, p * inv_keep, 0.0)
    else:
        pd = p
    # dv = pd^T @ do
    dv = jax.lax.dot_general(pd, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # dpd = do @ v^T
    dpd = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if dropout_rate > 0.0:
        dp = jnp.where(keep, dpd * inv_keep, 0.0)
    else:
        dp = dpd
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _bh_specs(B, H, L, d):
    # index_map also receives the scalar-prefetch ref (seed) — ignore it
    return pl.BlockSpec((1, 1, L, d), lambda b, h, *_: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)


def _mask_spec(B, L):
    # mask arrives as (B, 1, L); block (1, 1, L) keeps the trailing dims
    # equal to the array dims (Mosaic requires sublane%8==0 or full-dim)
    return pl.BlockSpec((1, 1, L), lambda b, h, *_: (b, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_attention(q, k, v, mask, seed_arr, dropout_rate, interpret,
                     causal):
    return _fused_attention_fwd(q, k, v, mask, seed_arr, dropout_rate,
                                interpret, causal)[0]


def _pallas_fwd(q, k, v, mask, seed_arr, dropout_rate, interpret, causal):
    B, H, Lq, d = q.shape
    Lk = k.shape[2]
    scale = 1.0 / (d ** 0.5)
    grid = (B, H)
    kernel = functools.partial(_fwd_kernel, scale=scale,
                               dropout_rate=dropout_rate, causal=causal)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[_bh_specs(B, H, Lq, d), _bh_specs(B, H, Lk, d),
                      _bh_specs(B, H, Lk, d), _mask_spec(B, Lk)],
            out_specs=_bh_specs(B, H, Lq, d),
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq, d), q.dtype),
        interpret=interpret,
    )(seed_arr, q, k, v, mask.reshape(B, 1, Lk))


def _fused_attention_fwd(q, k, v, mask, seed_arr, dropout_rate, interpret,
                         causal):
    out = _pallas_fwd(q, k, v, mask, seed_arr, dropout_rate, interpret,
                      causal)
    return out, (q, k, v, mask, seed_arr)


def _fused_attention_bwd(dropout_rate, interpret, causal, res, do):
    q, k, v, mask, seed_arr = res
    B, H, Lq, d = q.shape
    Lk = k.shape[2]
    scale = 1.0 / (d ** 0.5)
    kernel = functools.partial(_bwd_kernel, scale=scale,
                               dropout_rate=dropout_rate, causal=causal)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H),
            in_specs=[_bh_specs(B, H, Lq, d), _bh_specs(B, H, Lk, d),
                      _bh_specs(B, H, Lk, d), _mask_spec(B, Lk),
                      _bh_specs(B, H, Lq, d)],
            out_specs=[_bh_specs(B, H, Lq, d), _bh_specs(B, H, Lk, d),
                       _bh_specs(B, H, Lk, d)],
        ),
        out_shape=[jax.ShapeDtypeStruct((B, H, Lq, d), q.dtype),
                   jax.ShapeDtypeStruct((B, H, Lk, d), k.dtype),
                   jax.ShapeDtypeStruct((B, H, Lk, d), v.dtype)],
        interpret=interpret,
    )(seed_arr, q, k, v, mask.reshape(B, 1, Lk), do)
    return dq, dk, dv, None, None


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


# ---------------------------------------------------------------------------
# public dispatcher
# ---------------------------------------------------------------------------

def multi_head_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         kv_mask: Optional[jax.Array] = None,
                         dropout_rate: float = 0.0,
                         dropout_rng: Optional[jax.Array] = None,
                         causal: bool = False,
                         use_pallas: Optional[bool] = None) -> jax.Array:
    """Scaled dot-product attention over (B, H, L, d) tensors.

    ``kv_mask``: (B, Lk) with 1 = valid key.  ``causal=True`` additionally
    applies a lower-triangular mask (TVC decoder self-attention; requires
    Lq == Lk on the Pallas path so padding preserves the diagonal).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    B, H, Lq, d = q.shape
    Lk = k.shape[2]
    if kv_mask is None:
        kv_mask = jnp.ones((B, Lk), jnp.float32)
    kv_mask = kv_mask.astype(jnp.float32)
    if causal and Lq != Lk:
        use_pallas = False

    if not use_pallas:
        return mha_reference(q, k, v, kv_mask, dropout_rate, dropout_rng,
                             causal)

    # Pad sequence dims to lane-aligned multiples; padded keys get mask=0.
    Lq_p = _round_up(max(Lq, 8), 128)
    Lk_p = _round_up(max(Lk, 8), 128)
    pad_q = Lq_p - Lq
    pad_k = Lk_p - Lk
    if pad_q or pad_k:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, pad_k)))

    if dropout_rate > 0.0 and dropout_rng is not None:
        seed_arr = jax.random.randint(dropout_rng, (1,), 0, 2 ** 31 - 1,
                                      dtype=jnp.int32)
    else:
        dropout_rate = 0.0
        seed_arr = jnp.zeros((1,), jnp.int32)

    interpret = jax.default_backend() != "tpu"
    out = _fused_attention(q, k, v, kv_mask, seed_arr, dropout_rate,
                           interpret, causal)
    if pad_q:
        out = out[:, :, :Lq, :]
    return out
