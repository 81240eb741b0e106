"""Fused LayerNorm for TPU (Pallas) with custom VJP.

The reference uses apex's CUDA ``FusedLayerNorm`` for every LayerNorm in the
model (``model/layers.py:8-9``, ``model/embed.py:9``).  The TPU-native
equivalent is a Pallas kernel that computes mean/variance and the affine
transform in one VMEM pass; the backward kernel recomputes the row statistics
(cheaper than saving them: HERO rows are 768/4352 wide, recompute is
VPU-bound and avoids an HBM round-trip for residuals).

All statistics are computed in fp32 regardless of input dtype (bf16 safe),
matching apex semantics.  Public entry :func:`layer_norm` dispatches to the
kernel on TPU and to a jnp implementation elsewhere.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def layer_norm_reference(x: jax.Array, weight: jax.Array, bias: jax.Array,
                         eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas kernels (rows × features, rows tiled over the grid)
# ---------------------------------------------------------------------------

_BLOCK_ROWS = 256


def _block_rows(d: int) -> int:
    """Row-block size bounded so ~6 live f32 (rows, d) buffers fit VMEM
    (the wide 4352-dim img_LayerNorm would blow the 16MB budget at 256)."""
    return max(8, min(_BLOCK_ROWS, (1 << 18) // d // 8 * 8))


def _fwd_kernel(x_ref, w_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = xc * rstd
    o_ref[:] = (y * w_ref[0].astype(jnp.float32)
                + b_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _bwd_kernel(x_ref, w_ref, g_ref, dx_ref, dw_ref, db_ref, *, eps: float):
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    w = w_ref[0].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    # dx = rstd * (gw - mean(gw) - xhat * mean(gw * xhat))
    gw = g * w[None, :]
    m1 = jnp.mean(gw, axis=-1, keepdims=True)
    m2 = jnp.mean(gw * xhat, axis=-1, keepdims=True)
    dx_ref[:] = (rstd * (gw - m1 - xhat * m2)).astype(dx_ref.dtype)
    # parameter grads accumulated across row-blocks (grid is sequential on
    # TPU so += into the single output block is safe)
    pdw = jnp.sum(g * xhat, axis=0, keepdims=True)
    pdb = jnp.sum(g, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dw_ref[:] += pdw
    db_ref[:] += pdb


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_layer_norm(x2d, weight, bias, eps, interpret):
    return _fused_ln_fwd(x2d, weight, bias, eps, interpret)[0]


def _run_fwd(x2d, weight, bias, eps, interpret):
    n, d = x2d.shape
    rows = min(_block_rows(d), n)
    grid = (pl.cdiv(n, rows),)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=float(eps)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), x2d.dtype),
        interpret=interpret,
    )(x2d, weight.reshape(1, d), bias.reshape(1, d))


def _fused_ln_fwd(x2d, weight, bias, eps, interpret):
    out = _run_fwd(x2d, weight, bias, eps, interpret)
    return out, (x2d, weight, bias)


def _fused_ln_bwd(eps, interpret, res, g):
    x2d, weight, bias = res
    n, d = x2d.shape
    rows = min(_block_rows(d), n)
    grid = (pl.cdiv(n, rows),)
    dx, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=float(eps)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((n, d), x2d.dtype),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)],
        interpret=interpret,
    )(x2d, weight.reshape(1, d), g)
    return (dx, dw.reshape(-1).astype(weight.dtype),
            db.reshape(-1).astype(bias.dtype))


_fused_layer_norm.defvjp(_fused_ln_fwd, _fused_ln_bwd)


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array,
               eps: float = 1e-5,
               use_pallas: Optional[bool] = None) -> jax.Array:
    """LayerNorm over the last axis; any leading shape.

    Dispatch is measured (v5e): for the 768-wide model LNs, XLA's inlined
    LN fuses with the surrounding dropout/residual ops and beats a
    separate kernel launch; the Pallas kernel wins on the wide (4352-d)
    feature LNs where a single VMEM pass avoids spilling fp32 temps.
    """
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and x.shape[-1] >= 2048)
    if not use_pallas:
        return layer_norm_reference(x, weight, bias, eps)
    shape = x.shape
    d = shape[-1]
    n = 1
    for s in shape[:-1]:
        n *= s
    x2d = x.reshape(n, d)
    # pad rows to a multiple of the row block so every grid step is full
    # (partial out-of-bounds blocks would feed undefined rows into the
    # parameter-gradient accumulation)
    rows = min(_block_rows(d), _round_up(n, 8))
    n_pad = _round_up(n, rows) - n
    if n_pad:
        x2d = jnp.pad(x2d, ((0, n_pad), (0, 0)))
    interpret = jax.default_backend() != "tpu"
    out = _fused_layer_norm(x2d, weight, bias, float(eps), interpret)
    if n_pad:
        out = out[:n]
    return out.reshape(shape)
