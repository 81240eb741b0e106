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

# Pallas dispatch threshold: use the fused kernel when Lk >= this.  Measured
# on v5e with the v3 packed kernel: dispatching at HERO's 56-token sub rows
# and 100-frame clips cuts the VSM train step from 71.8 to 61.5 ms (the jnp
# path pays ~8 ms/step in head-transpose layout copies the packed kernel
# avoids).  Below ~48 keys the padding to 64 lanes stops paying.  Module
# level so perf sweeps / drivers can retune without editing call sites.
PALLAS_MIN_LK = 48


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
    """q,k,v: (B, H, L, d); kv_mask: (B, Lk) 1=valid, or a (B, L, S)
    SEGMENT one-hot (sub packing: token i may attend token j iff their
    one-hot rows match; all-zero rows = invalid slots, matching nothing).
    Returns (B, H, Lq, d)."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if kv_mask is not None and kv_mask.ndim == 3:
        seg = kv_mask.astype(jnp.float32)
        same = jnp.einsum("bqs,bks->bqk", seg[:, :q.shape[2]], seg)
        s = s + (1.0 - same)[:, None] * NEG_INF
    elif kv_mask is not None:
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
    """Uniform keep mask from the already-seeded TPU PRNG.

    ``prng_random_bits`` returns SIGNED int32 and ``>>`` is an arithmetic
    shift — a plain ``bits >> 8`` keeps the sign, sending half the draws
    negative (always dropped: effective rate 0.5 + rate/2, e.g. 0.6 for
    rate 0.1).  Use a logical shift so u is uniform in [0, 1)."""
    bits = pltpu.prng_random_bits(shape)  # int32
    u = (jax.lax.shift_right_logical(bits, 8).astype(jnp.float32)
         * (1.0 / (1 << 24)))
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
# v3: packed-layout kernel — (B, L, H, d) IO, saved-probs backward
# ---------------------------------------------------------------------------
#
# Motivation (v5e profile of the VSM step): the (B, L, HD) → (B, H, L, d)
# head transposes around the v2 kernel/jnp path cost ~8 ms/step in pure
# layout copies, and the jnp path's probs-dropout draws another ~1.5 ms of
# u32 traffic.  v3 reads qkv in the layout the projection produces
# (a free bitcast of (B, L, HD)), runs dropout on the TPU PRNG inside the
# kernel, and SAVES the softmax probabilities for the backward kernel —
# which then skips the qk matmul, softmax recompute, and mask add.


def _zero_oob_rows(t, n_valid: int):
    """Zero block rows ≥ n_valid.  k/v arrive as (Lk_p, D) blocks over
    unpadded (Lk, D) arrays — Mosaic fills the out-of-bounds tail with
    garbage, which would turn masked-score zeros into NaN via 0·NaN."""
    if n_valid >= t.shape[0]:
        return t
    row = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    return jnp.where(row < n_valid, t, jnp.zeros_like(t))


def _fwd3_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, p_ref, *,
                 scale: float, dropout_rate: float, causal: bool,
                 n_heads: int, head_dim: int, lk: int):
    # packed (L, H·d) blocks with static 64-aligned lane slices per head —
    # Mosaic rejects middle-dim (L, H, d) indexing around MXU ops in bf16
    b = pl.program_id(0)
    d = head_dim
    bias = (1.0 - mask_ref[0]) * NEG_INF          # (1, Lk_p)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0], b)
    q2 = q_ref[0]
    k2 = _zero_oob_rows(k_ref[0], lk)
    v2 = _zero_oob_rows(v_ref[0], lk)
    probs = []
    for h in range(n_heads):
        p = _probs(q2[:, h * d:(h + 1) * d], k2[:, h * d:(h + 1) * d],
                   bias, scale, causal)
        probs.append(p.astype(p_ref.dtype))
        if dropout_rate > 0.0:
            keep = _dropout_keep_mask(p.shape, dropout_rate)
            p = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
        o = jnp.dot(p.astype(v2.dtype), v2[:, h * d:(h + 1) * d],
                    preferred_element_type=jnp.float32)
        o_ref[0, :, h * d:(h + 1) * d] = o.astype(o_ref.dtype)
    p_ref[0] = jnp.stack(probs, axis=0)


def _fwd3_seg_kernel(seed_ref, q_ref, k_ref, v_ref, seg_ref, o_ref, p_ref,
                     *, scale: float, dropout_rate: float, n_heads: int,
                     head_dim: int, lk: int):
    """Segment-mask variant of :func:`_fwd3_kernel` (sub packing).

    ``seg_ref``: (1, Lk_p, S) one-hot segment ids in the model dtype;
    all-zero rows mark invalid/padded slots.  The block-diagonal bias is
    one tiny MXU matmul — ``seg · segᵀ`` is 1 iff both slots are valid
    and share a segment — replacing the 1-D key-validity bias.  Dropout
    draw shapes are identical to the non-seg kernel, so the PRNG stream
    (and the shared saved-probs backward) is unchanged.
    """
    b = pl.program_id(0)
    d = head_dim
    segk = seg_ref[0]                          # (Lk_p, S)
    lq = q_ref.shape[1]
    same = jax.lax.dot_general(segk[:lq], segk, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    bias = (1.0 - same) * NEG_INF              # (Lq, Lk_p)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0], b)
    q2 = q_ref[0]
    k2 = _zero_oob_rows(k_ref[0], lk)
    v2 = _zero_oob_rows(v_ref[0], lk)
    probs = []
    for h in range(n_heads):
        p = _probs(q2[:, h * d:(h + 1) * d], k2[:, h * d:(h + 1) * d],
                   bias, scale, False)
        probs.append(p.astype(p_ref.dtype))
        if dropout_rate > 0.0:
            keep = _dropout_keep_mask(p.shape, dropout_rate)
            p = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
        o = jnp.dot(p.astype(v2.dtype), v2[:, h * d:(h + 1) * d],
                    preferred_element_type=jnp.float32)
        o_ref[0, :, h * d:(h + 1) * d] = o.astype(o_ref.dtype)
    p_ref[0] = jnp.stack(probs, axis=0)


def _bwd3_kernel(seed_ref, p_ref, q_ref, k_ref, v_ref, do_ref,
                 dq_ref, dk_ref, dv_ref, *, scale: float,
                 dropout_rate: float, n_heads: int, head_dim: int,
                 lk: int):
    b = pl.program_id(0)
    d = head_dim
    if dropout_rate > 0.0:
        # same seed + same draw ORDER as the forward kernel
        pltpu.prng_seed(seed_ref[0], b)
    q2, do2 = q_ref[0], do_ref[0]
    k2 = _zero_oob_rows(k_ref[0], lk)
    v2 = _zero_oob_rows(v_ref[0], lk)
    p3 = p_ref[0]
    for h in range(n_heads):
        sl = slice(h * d, (h + 1) * d)
        q, k, v, do = q2[:, sl], k2[:, sl], v2[:, sl], do2[:, sl]
        p = p3[h].astype(jnp.float32)
        if dropout_rate > 0.0:
            keep = _dropout_keep_mask(p.shape, dropout_rate)
            inv = 1.0 / (1.0 - dropout_rate)
            pd = jnp.where(keep, p * inv, 0.0)
        else:
            pd = p
        pd16 = pd.astype(v.dtype)
        dv = jax.lax.dot_general(pd16, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dpd = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            dp = jnp.where(keep, dpd * inv, 0.0)
        else:
            dp = dpd
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds16 = ds.astype(q.dtype)
        dq = jnp.dot(ds16, k, preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds16, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _packed_spec(L, D):
    return pl.BlockSpec((1, L, D), lambda b, *_: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _probs_spec(H, Lq, Lk):
    return pl.BlockSpec((1, H, Lq, Lk), lambda b, *_: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused_attention3(q, k, v, mask, seed_arr, dropout_rate, interpret,
                      causal, n_heads):
    return _fused_attention3_fwd(q, k, v, mask, seed_arr, dropout_rate,
                                 interpret, causal, n_heads)[0]


def _fused_attention3_fwd(q, k, v, mask, seed_arr, dropout_rate, interpret,
                          causal, n_heads):
    # q, k, v: (B, L, H·d) packed.  k/v may be UNPADDED in the seq dim:
    # blocks are Lk_p = round_up(Lk, 64) and Mosaic masks the tail (OOB
    # reads are zeroed in-kernel, OOB writes dropped) — this removes the
    # two 50 MB HBM pads per layer the padded path paid.  mask arrives
    # already padded to Lk_p (cheap) so padded columns carry bias -inf.
    B, Lq, D = q.shape
    Lk = k.shape[1]
    Lk_p = mask.shape[-1]
    H = n_heads
    d = D // H
    scale = 1.0 / (d ** 0.5)
    kernel = functools.partial(_fwd3_kernel, scale=scale,
                               dropout_rate=dropout_rate, causal=causal,
                               n_heads=H, head_dim=d, lk=Lk)
    out, probs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[_packed_spec(Lq, D), _packed_spec(Lk_p, D),
                      _packed_spec(Lk_p, D), _mask_spec(Lk_p)],
            out_specs=[_packed_spec(Lq, D), _probs_spec(H, Lq, Lk_p)],
        ),
        out_shape=[jax.ShapeDtypeStruct((B, Lq, D), q.dtype),
                   jax.ShapeDtypeStruct((B, H, Lq, Lk_p), q.dtype)],
        interpret=interpret,
    )(seed_arr, q, k, v, mask.reshape(B, 1, Lk_p))
    return out, (probs, q, k, v, seed_arr)


def _fused_attention3_bwd(dropout_rate, interpret, causal, n_heads, res,
                          do):
    probs, q, k, v, seed_arr = res
    B, Lq, D = q.shape
    Lk = k.shape[1]
    Lk_p = probs.shape[-1]
    H = n_heads
    d = D // H
    scale = 1.0 / (d ** 0.5)
    kernel = functools.partial(_bwd3_kernel, scale=scale,
                               dropout_rate=dropout_rate, n_heads=H,
                               head_dim=d, lk=Lk)
    # dk/dv declared at the UNPADDED Lk: the kernel's (Lk_p, D) block
    # writes of rows ≥ Lk are out-of-bounds and dropped by Mosaic (those
    # rows are exactly 0 anyway: probs cols ≥ Lk are 0), so no unpad
    # slice materializes in HBM.
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[_probs_spec(H, Lq, Lk_p), _packed_spec(Lq, D),
                      _packed_spec(Lk_p, D), _packed_spec(Lk_p, D),
                      _packed_spec(Lq, D)],
            out_specs=[_packed_spec(Lq, D), _packed_spec(Lk_p, D),
                       _packed_spec(Lk_p, D)],
        ),
        out_shape=[jax.ShapeDtypeStruct((B, Lq, D), q.dtype),
                   jax.ShapeDtypeStruct((B, Lk, D), k.dtype),
                   jax.ShapeDtypeStruct((B, Lk, D), v.dtype)],
        interpret=interpret,
    )(seed_arr, probs, q, k, v, do)
    return dq, dk, dv, None, None


_fused_attention3.defvjp(_fused_attention3_fwd, _fused_attention3_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused_attention3_seg(q, k, v, seg, seed_arr, dropout_rate, interpret,
                          causal, n_heads):
    return _fused_attention3_seg_fwd(q, k, v, seg, seed_arr, dropout_rate,
                                     interpret, causal, n_heads)[0]


def _fused_attention3_seg_fwd(q, k, v, seg, seed_arr, dropout_rate,
                              interpret, causal, n_heads):
    """Seg-mask forward: identical IO contract to the v1 fwd except the
    (B, 1, Lk_p) validity mask becomes a (B, Lk_p, S) segment one-hot.
    The backward is SHARED with the non-seg path — it consumes only the
    saved probabilities (the bias is constant wrt q/k/v), so a masked
    column's exactly-zero prob kills its gradient identically."""
    del causal  # packing is encoder-only; the causal decoder never packs
    B, Lq, D = q.shape
    Lk = k.shape[1]
    Lk_p = seg.shape[1]
    H = n_heads
    d = D // H
    scale = 1.0 / (d ** 0.5)
    kernel = functools.partial(_fwd3_seg_kernel, scale=scale,
                               dropout_rate=dropout_rate, n_heads=H,
                               head_dim=d, lk=Lk)
    out, probs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[_packed_spec(Lq, D), _packed_spec(Lk_p, D),
                      _packed_spec(Lk_p, D),
                      _packed_spec(Lk_p, seg.shape[-1])],
            out_specs=[_packed_spec(Lq, D), _probs_spec(H, Lq, Lk_p)],
        ),
        out_shape=[jax.ShapeDtypeStruct((B, Lq, D), q.dtype),
                   jax.ShapeDtypeStruct((B, H, Lq, Lk_p), q.dtype)],
        interpret=interpret,
    )(seed_arr, q, k, v, seg)
    return out, (probs, q, k, v, seed_arr)


def _fused_attention3_seg_bwd(dropout_rate, interpret, causal, n_heads,
                              res, do):
    dq, dk, dv, *_ = _fused_attention3_bwd(dropout_rate, interpret, False,
                                           n_heads, res, do)
    return dq, dk, dv, None, None


_fused_attention3_seg.defvjp(_fused_attention3_seg_fwd,
                             _fused_attention3_seg_bwd)


def packed_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     n_heads: int, kv_mask: Optional[jax.Array] = None,
                     dropout_rate: float = 0.0,
                     dropout_rng: Optional[jax.Array] = None,
                     causal: bool = False,
                     use_pallas: Optional[bool] = None) -> jax.Array:
    """Attention over PACKED (B, L, H·d) tensors — the layout the QKV
    projection produces — returning (B, Lq, H·d).

    On TPU this dispatches to the v3 Pallas kernel (no head transposes,
    in-kernel dropout, saved-probs backward); elsewhere it reshapes and
    falls back to :func:`mha_reference`.

    ``kv_mask`` may be a (B, L, S) SEGMENT one-hot instead of the (B, Lk)
    validity vector (sub packing, self-attention only): token i attends
    token j iff their one-hot rows match; all-zero rows are invalid
    slots.  Numerically exact vs running each segment as its own row:
    cross-segment scores carry the same -1e4 bias as masked keys, whose
    softmax contribution underflows to exactly 0 in fp32.
    """
    B, Lq, D = q.shape
    Lk = k.shape[1]
    d = D // n_heads
    seg_mode = kv_mask is not None and kv_mask.ndim == 3
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and Lk >= PALLAS_MIN_LK)
    if causal and (Lq != Lk or seg_mode):
        use_pallas = False
    if kv_mask is None:
        kv_mask = jnp.ones((B, Lk), jnp.float32)
    if not seg_mode:
        kv_mask = kv_mask.astype(jnp.float32)

    if not use_pallas:
        to_heads = lambda t, L: t.reshape(B, L, n_heads, d).transpose(
            0, 2, 1, 3)
        out = mha_reference(to_heads(q, Lq), to_heads(k, Lk),
                            to_heads(v, Lk), kv_mask, dropout_rate,
                            dropout_rng, causal)
        return out.transpose(0, 2, 1, 3).reshape(B, Lq, D)

    qp, kp, vp = q, k, v
    # queries only need sublane (8) granularity; keys are the score
    # matrix's lane dim, rounded to 64-lane blocks (full-dim blocks keep
    # 64 legal) — at HERO's Lq=56 this skips 14% of score/output work vs
    # padding both.  Non-causal k/v stay UNPADDED: the kernel reads
    # (Lk_p, D) blocks over the (Lk, D) arrays and zeroes the OOB tail
    # in VMEM, saving two 50 MB HBM pads per layer (and the matching
    # dk/dv unpad slices in the backward) — only the tiny f32 mask is
    # padded, so padded score columns carry bias -inf.
    Lq_p = _round_up(max(Lq, 8), 8)
    Lk_p = _round_up(max(Lk, 8), 64)
    if causal:
        # the in-kernel causal bias aligns the diagonals via (Lk - Lq);
        # unequal padding would shift it and leak future keys
        Lq_p = Lk_p
    pad_q, pad_k = Lq_p - Lq, Lk_p - Lk
    if pad_q:
        qp = jnp.pad(qp, ((0, 0), (0, pad_q), (0, 0)))
    if causal and pad_k:
        kp = jnp.pad(kp, ((0, 0), (0, pad_k), (0, 0)))
        vp = jnp.pad(vp, ((0, 0), (0, pad_k), (0, 0)))
    if pad_k:
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, pad_k))
                          + ((0, 0),) * (kv_mask.ndim - 2))

    if dropout_rate > 0.0 and dropout_rng is not None:
        seed_arr = jax.random.randint(dropout_rng, (1,), 0, 2 ** 31 - 1,
                                      dtype=jnp.int32)
    else:
        dropout_rate = 0.0
        seed_arr = jnp.zeros((1,), jnp.int32)

    interpret = jax.default_backend() != "tpu"
    if seg_mode:
        # one-hot rows in the model dtype: the in-kernel seg·segᵀ bias is
        # a tiny MXU matmul, exact in bf16 (entries 0/1, ≤1 hit per row)
        out = _fused_attention3_seg(qp, kp, vp, kv_mask.astype(q.dtype),
                                    seed_arr, dropout_rate, interpret,
                                    causal, n_heads)
    else:
        out = _fused_attention3(qp, kp, vp, kv_mask, seed_arr,
                                dropout_rate, interpret, causal, n_heads)
    if pad_q:
        out = out[:, :Lq]
    return out


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

    Dispatch is shape-based (measured on v5e, see ``PALLAS_MIN_LK``):
    below ~48 keys XLA's fused unpadded path beats the VMEM-resident
    kernel (the 64-lane padding wastes more than the saved HBM
    round-trip); from there up the Pallas kernel wins and the gap grows
    with L².
    """
    B, H, Lq, d = q.shape
    Lk = k.shape[2]
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and Lk >= PALLAS_MIN_LK)
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
