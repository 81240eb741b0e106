"""Drive the Pallas kernels on the REAL TPU (Mosaic lowering + PRNG).

CPU tests run the kernels in interpret mode without the TPU PRNG, so this
script is the source of truth for (a) Mosaic lowering of the bf16 packed
layouts and (b) the in-kernel dropout semantics.  Run after ANY kernel
edit:  ``python tools/tpu_kernel_drive.py``.

The dropout-mean check is the one that catches PRNG bit-handling bugs:
``prng_random_bits`` returns SIGNED int32, and an arithmetic ``>> 8`` once
shipped an effective drop rate of 0.6 instead of 0.1 — E[out] under
dropout must match the no-dropout output because the kept probs are
rescaled by 1/(1-rate).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hero_tpu.ops.attention import packed_attention
from hero_tpu.ops.layernorm import dropout_add_layer_norm as daln


def check_attention():
    key = jax.random.PRNGKey(0)
    for L in (56, 100):
        B, H, d = 8, 12, 64
        D = H * d
        q = jax.random.normal(key, (B, L, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 1), (B, L, D),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 2), (B, L, D),
                              jnp.bfloat16)
        mask = (jax.random.uniform(jax.random.fold_in(key, 3), (B, L))
                > 0.2).astype(jnp.float32)
        o_r = packed_attention(q, k, v, H, mask, use_pallas=False)
        o_p = packed_attention(q, k, v, H, mask, use_pallas=True)
        err = float(jnp.max(jnp.abs(o_r.astype(jnp.float32)
                                    - o_p.astype(jnp.float32))))
        gr = jax.grad(lambda qq: jnp.sum(packed_attention(
            qq, k, v, H, mask, use_pallas=False
            ).astype(jnp.float32) ** 2))(q)
        gp = jax.grad(lambda qq: jnp.sum(packed_attention(
            qq, k, v, H, mask, use_pallas=True
            ).astype(jnp.float32) ** 2))(q)
        gerr = float(jnp.max(jnp.abs(gr.astype(jnp.float32)
                                     - gp.astype(jnp.float32))))
        assert err < 0.05 and gerr < 2.0, (L, err, gerr)

        # dropout: deterministic AND unbiased (E[out] == no-dropout out;
        # a wrong effective rate shifts the mean by (1-r_eff)/(1-r))
        dr = jax.random.PRNGKey(5)
        rate = 0.1
        outs = []
        for i in range(24):
            outs.append(np.asarray(packed_attention(
                q, k, v, H, mask, dropout_rate=rate,
                dropout_rng=jax.random.fold_in(dr, i), use_pallas=True),
                np.float32))
        o1 = packed_attention(q, k, v, H, mask, dropout_rate=rate,
                              dropout_rng=dr, use_pallas=True)
        o2 = packed_attention(q, k, v, H, mask, dropout_rate=rate,
                              dropout_rng=dr, use_pallas=True)
        det = float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                                    - o2.astype(jnp.float32))))
        assert det == 0.0, det
        mean_ratio = (np.mean(np.stack(outs), axis=0).ravel()
                      @ np.asarray(o_p, np.float32).ravel()) / max(
            float(np.sum(np.asarray(o_p, np.float32) ** 2)), 1e-6)
        assert 0.93 < mean_ratio < 1.07, f"dropout bias: {mean_ratio}"
        print(f"attention L={L}: fwd_err={err:.4f} dq_err={gerr:.3f} "
              f"dropout_det={det} mean_ratio={mean_ratio:.3f}", flush=True)


def check_seg_attention():
    """Seg-mask mode (sub packing): (B, L, S) segment one-hot instead of
    the validity vector.  fp32 path vs the XLA reference lands ~1.5e-4
    (MXU default-precision matmuls differ between the two programs);
    bf16 uses the v1 tolerances."""
    key = jax.random.PRNGKey(11)
    B, L, D, H, S = 8, 224, 768, 12, 16
    ids = np.full((B, L), -1, np.int32)
    for b in range(B):
        off = 0
        for s in range(S):
            n = 8 + (s * 7 + b) % 9
            if off + n > L:
                break
            ids[b, off:off + n] = s
            off += n
    seg = jax.nn.one_hot(jnp.asarray(ids), S, dtype=jnp.bfloat16)
    q = jax.random.normal(key, (B, L, D), jnp.bfloat16) / 8
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, L, D),
                          jnp.bfloat16) / 8
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, L, D),
                          jnp.bfloat16) / 8
    o_r = packed_attention(q, k, v, H, seg, use_pallas=False)
    o_p = packed_attention(q, k, v, H, seg, use_pallas=True)
    valid = jnp.asarray((ids >= 0)[..., None])
    err = float(jnp.max(jnp.abs(jnp.where(
        valid, o_r.astype(jnp.float32) - o_p.astype(jnp.float32), 0.0))))
    assert err < 0.05, err

    def loss(qq, pallas):
        o = packed_attention(qq, k, v, H, seg, use_pallas=pallas)
        return jnp.sum(jnp.where(valid, o.astype(jnp.float32), 0.0) ** 2)

    gr = jax.grad(lambda qq: loss(qq, False))(q)
    gp = jax.grad(lambda qq: loss(qq, True))(q)
    gerr = float(jnp.max(jnp.abs(gr.astype(jnp.float32)
                                 - gp.astype(jnp.float32))))
    assert gerr < 2.0, gerr

    # dropout determinism + train-mode fwd+bwd lowering
    dr = jax.random.PRNGKey(13)
    o1 = packed_attention(q, k, v, H, seg, dropout_rate=0.1,
                          dropout_rng=dr, use_pallas=True)
    o2 = packed_attention(q, k, v, H, seg, dropout_rate=0.1,
                          dropout_rng=dr, use_pallas=True)
    det = float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                                - o2.astype(jnp.float32))))
    assert det == 0.0, det
    gd = jax.jit(jax.grad(lambda qq: jnp.sum(packed_attention(
        qq, k, v, H, seg, dropout_rate=0.1, dropout_rng=dr,
        use_pallas=True).astype(jnp.float32) ** 2)))(q)
    gn = float(jnp.sum(jnp.abs(gd.astype(jnp.float32))))
    assert np.isfinite(gn) and gn > 0, gn
    print(f"seg attention L={L} S={S}: fwd_err={err:.5f} "
          f"dq_err={gerr:.3f} dropout_det={det}", flush=True)


def check_daln():
    N, D = 1024, 768
    w = jnp.ones((D,))
    b = jnp.zeros((D,))
    r = jax.random.PRNGKey(7)
    ones = jnp.ones((N, D), jnp.float32)
    zer = jnp.zeros((N, D), jnp.float32)
    o = np.asarray(daln(ones, zer, w, b, rate=0.1, rng=r,
                        use_pallas=True))
    thr = (o.max(1, keepdims=True) + o.min(1, keepdims=True)) / 2
    M = o > thr
    keep = M.mean()
    assert 0.88 < keep < 0.92, keep

    key = jax.random.PRNGKey(0)
    y = jax.random.normal(key, (N, D), jnp.float32)
    x = jax.random.normal(jax.random.fold_in(key, 1), (N, D), jnp.float32)
    o1 = daln(y, x, w, b, rate=0.1, rng=r, use_pallas=True)
    yy = np.asarray(y).copy()
    yy[~M] += 100.0                       # perturb DROPPED entries only
    o3 = daln(jnp.asarray(yy), x, w, b, rate=0.1, rng=r, use_pallas=True)
    delta = float(jnp.max(jnp.abs(o3 - o1)))
    assert delta == 0.0, f"fwd/bwd mask inconsistency: {delta}"
    print(f"daln: keep_rate={keep:.4f} fwd/bwd masks consistent",
          flush=True)


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", "run on the real TPU"
    check_attention()
    check_seg_attention()
    check_daln()
    print("TPU KERNEL DRIVE PASSED", flush=True)
