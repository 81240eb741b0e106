"""Fused multi-head attention for TPU.

HERO's attention is short-sequence, high-count: stage-1 runs ``n_subs``
sequences of ~80-160 tokens, stage-2 runs clips of ~100 frames (reference
``model/layers.py:96-164`` materializes the full score matrix in HBM).  In
this regime the fused kernel keeps the whole per-row score tile in VMEM —
one HBM round-trip for q/k/v/out, no (B, H, L, L) score materialization.

Kernel design (v2, tuned on v5e):
- grid is ``(B,)`` with ALL heads processed per program (an unrolled head
  loop) — 12× fewer programs than a (B, H) grid, so Mosaic pipelines DMA
  across rows instead of thrashing tiny programs;
- matmuls run in the input dtype (bf16 on the MXU) with fp32
  accumulation; softmax statistics in fp32;
- attention-probability dropout (p=0.1 in training) runs *inside* the
  kernel with the TPU PRNG; the backward kernel regenerates the identical
  mask from the same seed, so the custom VJP is exact.

The public entry :func:`multi_head_attention` dispatches to the Pallas
kernel on TPU and to a jnp reference path elsewhere (CPU tests force the
jnp path or interpret mode).
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
# Pallas fused kernel (all heads per program)
# ---------------------------------------------------------------------------

def _dropout_keep_mask(shape, rate: float):
    """Uniform keep mask from the already-seeded TPU PRNG."""
    bits = pltpu.prng_random_bits(shape)  # uint32
    u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
    return u >= rate


def _causal_bias(Lq: int, Lk: int):
    row = jax.lax.broadcasted_iota(jnp.int32, (Lq, Lk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Lq, Lk), 1)
    return jnp.where(col > row + (Lk - Lq), NEG_INF, 0.0)


def _probs(q, k, bias, scale, causal):
    """softmax(q kᵀ · scale + bias) in fp32; q,k stay in input dtype so the
    MXU runs its native bf16 path."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + bias
    if causal:
        s = s + _causal_bias(s.shape[0], s.shape[1])
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                scale: float, dropout_rate: float, causal: bool,
                n_heads: int):
    b = pl.program_id(0)
    bias = (1.0 - mask_ref[0]) * NEG_INF          # (1, Lk)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0], b)
    for h in range(n_heads):
        p = _probs(q_ref[0, h], k_ref[0, h], bias, scale, causal)
        if dropout_rate > 0.0:
            keep = _dropout_keep_mask(p.shape, dropout_rate)
            p = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
        o = jnp.dot(p.astype(v_ref.dtype), v_ref[0, h],
                    preferred_element_type=jnp.float32)
        o_ref[0, h] = o.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float,
                dropout_rate: float, causal: bool, n_heads: int):
    b = pl.program_id(0)
    bias = (1.0 - mask_ref[0]) * NEG_INF
    if dropout_rate > 0.0:
        # identical seed + identical draw ORDER as the forward kernel
        pltpu.prng_seed(seed_ref[0], b)
    for h in range(n_heads):
        q, k, v = q_ref[0, h], k_ref[0, h], v_ref[0, h]
        do = do_ref[0, h].astype(jnp.float32)
        p = _probs(q, k, bias, scale, causal)
        if dropout_rate > 0.0:
            keep = _dropout_keep_mask(p.shape, dropout_rate)
            inv_keep = 1.0 / (1.0 - dropout_rate)
            pd = jnp.where(keep, p * inv_keep, 0.0)
        else:
            pd = p
        pd16 = pd.astype(v.dtype)
        dv = jax.lax.dot_general(pd16, do.astype(v.dtype),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dpd = jax.lax.dot_general(do.astype(v.dtype), v,
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            dp = jnp.where(keep, dpd * inv_keep, 0.0)
        else:
            dp = dpd
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds16 = ds.astype(q.dtype)
        dq = jnp.dot(ds16, k, preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds16, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        dq_ref[0, h] = dq.astype(dq_ref.dtype)
        dk_ref[0, h] = dk.astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)


def _row_specs(H, L, d):
    # index_map also receives the scalar-prefetch ref (seed) — ignore it
    return pl.BlockSpec((1, H, L, d), lambda b, *_: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _mask_spec(L):
    # mask arrives as (B, 1, L); block keeps trailing dims == array dims
    return pl.BlockSpec((1, 1, L), lambda b, *_: (b, 0, 0),
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
    kernel = functools.partial(_fwd_kernel, scale=scale,
                               dropout_rate=dropout_rate, causal=causal,
                               n_heads=H)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[_row_specs(H, Lq, d), _row_specs(H, Lk, d),
                      _row_specs(H, Lk, d), _mask_spec(Lk)],
            out_specs=_row_specs(H, Lq, d),
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
                               dropout_rate=dropout_rate, causal=causal,
                               n_heads=H)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[_row_specs(H, Lq, d), _row_specs(H, Lk, d),
                      _row_specs(H, Lk, d), _mask_spec(Lk),
                      _row_specs(H, Lq, d)],
            out_specs=[_row_specs(H, Lq, d), _row_specs(H, Lk, d),
                       _row_specs(H, Lk, d)],
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

    Dispatch is shape-based (measured on v5e): below ~256 keys, XLA's
    fused unpadded path beats the VMEM-resident kernel (the 128-lane
    padding wastes more than the saved HBM round-trip); above it, the
    Pallas kernel wins and the gap grows with L².
    """
    B, H, Lq, d = q.shape
    Lk = k.shape[2]
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu" and Lk > 128)
    if kv_mask is None:
        kv_mask = jnp.ones((B, Lk), jnp.float32)
    kv_mask = kv_mask.astype(jnp.float32)
    if causal and Lq != Lk:
        use_pallas = False

    if not use_pallas:
        return mha_reference(q, k, v, kv_mask, dropout_rate, dropout_rng,
                             causal)

    # Pad sequence dims to lane-aligned multiples; padded keys get mask=0.
    # 64 is legal because the kernel's block dims equal the array dims
    # (Mosaic full-dim rule); it quarters the score-tile waste at HERO's
    # ~56-token sequences vs padding to 128.
    Lq_p = _round_up(max(Lq, 8), 64)
    Lk_p = _round_up(max(Lk, 8), 64)
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
