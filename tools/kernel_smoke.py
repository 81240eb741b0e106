"""On-chip kernel smoke: the mandatory post-kernel-edit gate.

CPU tests run the Pallas kernels in interpret mode, so Mosaic lowering
bugs only surface on the real TPU (CLAUDE.md), and the full
``tools/tpu_kernel_drive.py`` takes ~8 min through the tunnel because it
compiles ~30 separate programs.  This smoke pins the same parity
invariants at the FLAGSHIP row shapes in ONE compiled program — every
pallas-vs-jnp-reference error, the dropout determinism/bias checks, and
the fused-LN parity are computed on device and fetched as a single dict
of scalars — so the wall time is one remote compile plus seconds.
Measured on the tunneled v5e: ~400 s end-to-end, ~all of it the single
remote compile (a local TPU host compiles the same program in well under
2 min); the checks themselves are seconds.

Checks (tolerances carried over from tpu_kernel_drive):
- seg-mode packed attention (the production --pack_subs layout,
  128 rows x 104 slots x 16 segments) fwd + dq parity vs the jnp
  reference, masked to valid slots;
- validity-mode attention at the c_encoder shape (32, 100) fwd + dq;
- in-kernel PRNG dropout: bit-determinism (same key -> identical
  output) and unbiasedness (8-sample mean projects onto the no-dropout
  output with ratio ~1; a wrong effective rate r_eff shifts it by
  (1-r_eff)/(1-r) — the signed->logical shift bug showed 0.56);
- fused LayerNorm at the wide img-LN shape (800, 4352) fwd + dx parity;
- dropout_add_layer_norm keep-rate (~0.9 at rate 0.1) + determinism.

Exit 0 prints ``KERNEL SMOKE PASSED`` with the measured scalars.
Run after ANY edit under hero_tpu/ops/:  ``python tools/kernel_smoke.py``.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hero_tpu.const import PACK_MAX_SEGS
from hero_tpu.ops.attention import packed_attention
from hero_tpu.ops import layernorm as ln_lib

# flagship packed f_enc ROW shape (16 frame + 88 text slots).  Mosaic
# lowering depends on the in-row geometry (L, D, H, seg count — block
# shapes, lane slices), not the batch count (the grid dim), so the batch
# dims are kept small to hold the one remote compile under 2 minutes.
B, L, D, H, S = 16, 104, 768, 12, PACK_MAX_SEGS
# c_encoder shape (validity-mask mode)
BC, LC = 8, 100
# wide img-LN shape (rows x vfeat_dim)
NW, DW = 256, 4352
RATE = 0.1
N_DROP_SAMPLES = 4


def build_inputs(seed=0):
    r = np.random.RandomState(seed)
    seg_ids = np.full((B, L), -1, np.int32)
    for b in range(B):
        off = 0
        for s in range(S):
            n = 5 + (s * 7 + b) % 11
            if off + n > L:
                break
            seg_ids[b, off:off + n] = s
            off += n
    return {
        "q": (r.randn(B, L, D) / 8).astype(np.float32),
        "k": (r.randn(B, L, D) / 8).astype(np.float32),
        "v": (r.randn(B, L, D) / 8).astype(np.float32),
        "seg_ids": seg_ids,
        "qc": (r.randn(BC, LC, D) / 8).astype(np.float32),
        "vmask": (r.rand(BC, LC) > 0.2).astype(np.float32),
        "xw": r.randn(NW, DW).astype(np.float32),
        "w": (1.0 + 0.1 * r.randn(DW)).astype(np.float32),
        "b": (0.1 * r.randn(DW)).astype(np.float32),
    }


def smoke(q, k, v, seg_ids, qc, vmask, xw, w, b, key):
    out = {}
    q = q.astype(jnp.bfloat16)
    k = k.astype(jnp.bfloat16)
    v = v.astype(jnp.bfloat16)
    qc = qc.astype(jnp.bfloat16)
    seg = jax.nn.one_hot(seg_ids, S, dtype=jnp.bfloat16)
    valid = (seg_ids >= 0)[..., None]

    def masked_err(a, bb):
        return jnp.max(jnp.abs(jnp.where(
            valid, a.astype(jnp.float32) - bb.astype(jnp.float32), 0.0)))

    # --- seg-mode attention (production packed layout) fwd + dq
    o_ref = packed_attention(q, k, v, H, seg, use_pallas=False)
    o_pal = packed_attention(q, k, v, H, seg, use_pallas=True)
    out["seg_fwd_err"] = masked_err(o_ref, o_pal)

    def seg_loss(qq, pallas):
        o = packed_attention(qq, k, v, H, seg, use_pallas=pallas)
        return jnp.sum(jnp.where(valid, o.astype(jnp.float32), 0.0) ** 2)

    g_ref = jax.grad(lambda qq: seg_loss(qq, False))(q)
    g_pal = jax.grad(lambda qq: seg_loss(qq, True))(q)
    out["seg_dq_err"] = jnp.max(jnp.abs(
        g_ref.astype(jnp.float32) - g_pal.astype(jnp.float32)))

    # --- validity-mode attention at the c_encoder shape fwd + dq
    oc_ref = packed_attention(qc, qc, qc, H, vmask, use_pallas=False)
    oc_pal = packed_attention(qc, qc, qc, H, vmask, use_pallas=True)
    out["val_fwd_err"] = jnp.max(jnp.abs(
        oc_ref.astype(jnp.float32) - oc_pal.astype(jnp.float32)))

    def val_loss(qq, pallas):
        o = packed_attention(qq, qc, qc, H, vmask, use_pallas=pallas)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    gc_ref = jax.grad(lambda qq: val_loss(qq, False))(qc)
    gc_pal = jax.grad(lambda qq: val_loss(qq, True))(qc)
    out["val_dq_err"] = jnp.max(jnp.abs(
        gc_ref.astype(jnp.float32) - gc_pal.astype(jnp.float32)))

    # --- in-kernel PRNG dropout: determinism + unbiased effective rate
    o1 = packed_attention(q, k, v, H, seg, dropout_rate=RATE,
                          dropout_rng=key, use_pallas=True)
    o2 = packed_attention(q, k, v, H, seg, dropout_rate=RATE,
                          dropout_rng=key, use_pallas=True)
    out["drop_det"] = jnp.max(jnp.abs(
        o1.astype(jnp.float32) - o2.astype(jnp.float32)))

    def body(acc, i):
        o = packed_attention(q, k, v, H, seg, dropout_rate=RATE,
                             dropout_rng=jax.random.fold_in(key, i),
                             use_pallas=True)
        return acc + jnp.where(valid, o.astype(jnp.float32), 0.0), None

    acc, _ = jax.lax.scan(body, jnp.zeros((B, L, D), jnp.float32),
                          jnp.arange(N_DROP_SAMPLES))
    mean = acc / N_DROP_SAMPLES
    base = jnp.where(valid, o_pal.astype(jnp.float32), 0.0)
    out["drop_mean_ratio"] = (jnp.vdot(mean, base)
                              / jnp.maximum(jnp.vdot(base, base), 1e-6))

    # --- fused LayerNorm at the wide img-LN shape: fwd + dx parity
    lw_ref = ln_lib.layer_norm_reference(xw, w, b)
    lw_pal = ln_lib.layer_norm(xw, w, b, use_pallas=True)
    out["ln_fwd_err"] = jnp.max(jnp.abs(lw_ref - lw_pal))

    def ln_loss(xx, pallas):
        y = (ln_lib.layer_norm(xx, w, b, use_pallas=True) if pallas
             else ln_lib.layer_norm_reference(xx, w, b))
        return jnp.sum(y.astype(jnp.float32) ** 2)

    gl_ref = jax.grad(lambda xx: ln_loss(xx, False))(xw)
    gl_pal = jax.grad(lambda xx: ln_loss(xx, True))(xw)
    out["ln_dx_err"] = jnp.max(jnp.abs(gl_ref - gl_pal))

    # --- dropout_add_layer_norm: keep rate + determinism
    ones = jnp.ones((NW, DW), jnp.float32)
    zer = jnp.zeros((NW, DW), jnp.float32)
    wd = jnp.ones((DW,), jnp.float32)
    bd = jnp.zeros((DW,), jnp.float32)
    od = ln_lib.dropout_add_layer_norm(ones, zer, wd, bd, rate=RATE,
                                       rng=key, use_pallas=True)
    od2 = ln_lib.dropout_add_layer_norm(ones, zer, wd, bd, rate=RATE,
                                        rng=key, use_pallas=True)
    out["daln_det"] = jnp.max(jnp.abs(od - od2))
    thr = ((jnp.max(od, axis=1, keepdims=True)
            + jnp.min(od, axis=1, keepdims=True)) / 2)
    out["daln_keep_rate"] = jnp.mean((od > thr).astype(jnp.float32))
    return out


CHECKS = [
    # (name, low, high) — values outside [low, high] fail
    ("seg_fwd_err", 0.0, 0.05),
    ("seg_dq_err", 0.0, 2.0),
    ("val_fwd_err", 0.0, 0.05),
    ("val_dq_err", 0.0, 2.0),
    ("drop_det", 0.0, 0.0),
    ("drop_mean_ratio", 0.90, 1.10),
    ("ln_fwd_err", 0.0, 1e-4),
    ("ln_dx_err", 0.0, 1e-2),
    ("daln_det", 0.0, 0.0),
    ("daln_keep_rate", 0.87, 0.93),
]


def main():
    from hero_tpu.utils.misc import enable_fast_rng
    enable_fast_rng()
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        print("WARNING: not on TPU — interpret mode only exercises "
              "kernel MATH, not Mosaic lowering", file=sys.stderr)
    t0 = time.perf_counter()
    inp = build_inputs()
    args = [jnp.asarray(inp[k]) for k in
            ("q", "k", "v", "seg_ids", "qc", "vmask", "xw", "w", "b")]
    key = jax.random.PRNGKey(5)
    out = jax.jit(smoke)(*args, key)
    vals = {k: float(v) for k, v in out.items()}   # one fetch syncs all
    dt = time.perf_counter() - t0
    failed = [(n, vals[n], lo, hi) for n, lo, hi in CHECKS
              if not (lo <= vals[n] <= hi)]
    for n, lo, hi in CHECKS:
        mark = "FAIL" if any(f[0] == n for f in failed) else "ok"
        print(f"  {n:18s} {vals[n]:12.6f}   [{lo}, {hi}]  {mark}",
              flush=True)
    if failed:
        print(f"KERNEL SMOKE FAILED in {dt:.1f}s: {failed}")
        sys.exit(1)
    print(f"KERNEL SMOKE PASSED in {dt:.1f}s "
          f"(backend={jax.default_backend()})")


if __name__ == "__main__":
    main()
