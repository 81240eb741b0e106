"""Component-level timing on the real TPU: where do the 72 ms/step go?

Times each building block of the VSM step in isolation with a
data-dependence chain (through the tunnel only a value fetch syncs, and a
scalar carry prevents XLA from hoisting loop-invariant work).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hero_tpu.utils.misc import enable_fast_rng


def timeit(name, fn, *args, n=20, grad=False):
    """fn(*args, s) -> scalar; s is a carry folded into the inputs."""
    if grad:
        g = jax.grad(fn, argnums=tuple(range(len(args))))
        run = jax.jit(lambda s: sum(
            jnp.sum(x).astype(jnp.float32) * 1e-20
            for x in g(*[a + s * 1e-30 for a in args])) + s)
    else:
        run = jax.jit(lambda s: fn(*[a + s * 1e-30 if a.dtype in
                                     (jnp.float32, jnp.bfloat16) else a
                                     for a in args]) * 1e-20 + s)
    s = jnp.zeros((), jnp.float32)
    for _ in range(3):
        s = run(s)
    float(s)
    t0 = time.perf_counter()
    for _ in range(n):
        s = run(s)
    float(s)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:42s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    enable_fast_rng()
    print(f"backend={jax.default_backend()}", flush=True)
    key = jax.random.PRNGKey(0)
    D, I = 768, 3072
    N = 256 * 56                     # f_enc token rows at bench shape
    x = jax.random.normal(key, (N, D), jnp.bfloat16)
    w1 = jax.random.normal(key, (D, I), jnp.bfloat16)
    w2 = jax.random.normal(key, (I, D), jnp.bfloat16)
    wqkv = jax.random.normal(key, (D, 3 * D), jnp.bfloat16)

    # --- pure matmul ceiling
    def mm(x, w1, w2):
        return jnp.sum(jnp.dot(jnp.dot(x, w1), w2,
                               preferred_element_type=jnp.float32))
    d = timeit("matmul NxDxI + NxIxD (ffn pair)", mm, x, w1, w2)
    fl = 2 * N * D * I * 2
    print(f"    -> {fl / d / 1e9:.0f} TF/s")

    def mm2(x, w):
        return jnp.sum(jnp.dot(x, w, preferred_element_type=jnp.float32))
    timeit("matmul qkv (N,D)x(D,3D)", mm2, x, wqkv)

    # --- layernorm kernel
    from hero_tpu.ops.layernorm import layer_norm
    g = jnp.ones((D,), jnp.float32)
    b = jnp.zeros((D,), jnp.float32)
    x3 = x.reshape(256, 56, D)
    def ln(x3):
        return jnp.sum(layer_norm(x3, g, b).astype(jnp.float32))
    timeit("pallas layer_norm (256,56,768) fwd", ln, x3)
    timeit("pallas layer_norm fwd+bwd", ln, x3, grad=True)

    # --- attention jnp path (f_enc shape)
    from hero_tpu.ops.attention import mha_reference, multi_head_attention
    q = jax.random.normal(key, (256, 12, 56, 64), jnp.bfloat16)
    m = jnp.ones((256, 56), jnp.float32)
    def att(q):
        return jnp.sum(mha_reference(q, q, q, m).astype(jnp.float32))
    timeit("mha_reference (256,12,56,64) fwd", att, q)
    timeit("mha_reference fwd+bwd", att, q, grad=True)

    def attp(q):
        return jnp.sum(multi_head_attention(q, q, q, m,
                                            use_pallas=True
                                            ).astype(jnp.float32))
    timeit("pallas attention fwd", attp, q)
    timeit("pallas attention fwd+bwd", attp, q, grad=True)

    # --- dropout cost
    def drop(x):
        k = jax.random.PRNGKey(1)
        keep = jax.random.bernoulli(k, 0.9, x.shape)
        return jnp.sum(jnp.where(keep, x, 0).astype(jnp.float32))
    timeit("dropout mask (14336,768)", drop, x)

    # --- full encoder stacks fwd
    from hero_tpu.config.model_config import TransformerConfig
    from hero_tpu.models import transformer
    cfg = TransformerConfig(hidden_size=768, num_hidden_layers=6,
                            num_attention_heads=12, intermediate_size=3072,
                            max_position_embeddings=514,
                            vocab_size=50272, type_vocab_size=2)
    params6 = transformer.init_encoder(jax.random.PRNGKey(2), cfg)
    xf = jax.random.normal(key, (256, 56, D), jnp.bfloat16)
    mf = jnp.ones((256, 56), jnp.float32)

    def enc_fwd(xf):
        return jnp.sum(transformer.encoder(
            params6, xf, mf, cfg, dtype=jnp.bfloat16).astype(jnp.float32))
    d = timeit("f_enc 6L (256,56,768) fwd no-dropout", enc_fwd, xf)
    d = timeit("f_enc 6L fwd+bwd no-dropout", enc_fwd, xf, grad=True)

    def enc_fwd_train(xf):
        return jnp.sum(transformer.encoder(
            params6, xf, mf, cfg, rng=jax.random.PRNGKey(3), train=True,
            dtype=jnp.bfloat16).astype(jnp.float32))
    timeit("f_enc 6L fwd train(dropout)", enc_fwd_train, xf)
    timeit("f_enc 6L fwd+bwd train(dropout)", enc_fwd_train, xf, grad=True)

    cfg3 = cfg.replace(num_hidden_layers=3)
    params3 = transformer.init_encoder(jax.random.PRNGKey(2), cfg3)
    xc = jax.random.normal(key, (32, 100, D), jnp.bfloat16)
    mc = jnp.ones((32, 100), jnp.float32)
    def cenc(xc):
        return jnp.sum(transformer.encoder(
            params3, xc, mc, cfg3, dtype=jnp.bfloat16).astype(jnp.float32))
    timeit("c_enc 3L (32,100,768) fwd+bwd", cenc, xc, grad=True)

    # --- embedding + heads cost proxy: full forward_vsm fwd only
    from hero_tpu.config.model_config import HeroConfig
    from hero_tpu.data import synthetic
    from hero_tpu.models import pretrain
    import bench
    hcfg = bench.flagship_config()
    vsm = pretrain.VsmConfig(lw_neg_ctx=8.0, lw_neg_q=8.0, lw_st_ed=0.01)
    shape = synthetic.BatchShape(batch=32, n_subs=8, txt_len=40,
                                 frames_per_sub=16, n_frames=100,
                                 n_queries=2, query_len=30)
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(0), hcfg)
    batch = {k: jnp.asarray(v) for k, v in synthetic.vsm_batch(shape).items()}

    @jax.jit
    def fwd(s, params, batch):
        # params/batch as jit ARGS: closing over them bakes them into the
        # compile payload (HTTP 413 through the remote-compile tunnel)
        b = dict(batch)
        b["c_v_feats"] = b["c_v_feats"] + s * 1e-30
        a, bb, c = pretrain.forward_vsm(params, hcfg, vsm, b,
                                        rng=jax.random.PRNGKey(1),
                                        train=True, dtype=jnp.bfloat16)
        return s + (a + bb + c) * 1e-20
    s = jnp.zeros((), jnp.float32)
    for _ in range(3):
        s = fwd(s, params, batch)
    float(s)
    t0 = time.perf_counter()
    for _ in range(10):
        s = fwd(s, params, batch)
    float(s)
    print(f"{'forward_vsm full fwd train':42s} "
          f"{(time.perf_counter() - t0) / 10 * 1000:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
