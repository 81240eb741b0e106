"""Perf sweep for the VSM pretrain step on the real TPU chip.

Runs bench.py's workload under several configurations and prints a table:
remat on/off, Pallas attention threshold, per-chip batch size,
drop_svmr_prob, dropout on/off (diagnostic upper bound).

Usage:  timeout 3600 python tools/perf_sweep.py [variant ...]
With no args runs the default sweep list.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hero_tpu.config.model_config import HeroConfig, TransformerConfig
from hero_tpu.data import synthetic
from hero_tpu.models import pretrain, transformer
from hero_tpu.ops import attention
from hero_tpu.training.step import TrainSpec, TrainState, make_train_step
from hero_tpu.utils.misc import enable_fast_rng

import bench


def run_variant(name, *, batch=32, remat=False, pallas_min_lk=None,
                drop_svmr=0.0, train=True, n_steps=20, unroll=True,
                clip_proj=False):     # False = module default (measured
    from hero_tpu.models import model as backbone   # faster; model.py)
    backbone.PROJECT_CLIP_LEVEL = clip_proj
    transformer.set_remat(remat)
    transformer.UNROLL = unroll
    if pallas_min_lk is not None:
        attention.PALLAS_MIN_LK = pallas_min_lk
    cfg = bench.flagship_config()
    vsm = pretrain.VsmConfig(lw_neg_ctx=8.0, lw_neg_q=8.0, lw_st_ed=0.01,
                             drop_svmr_prob=drop_svmr)
    # matches bench.py's justified bucket (n_subs=16)
    shape = synthetic.BatchShape(batch=batch, n_subs=16, txt_len=40,
                                 frames_per_sub=16, n_frames=100,
                                 n_queries=2, query_len=30)
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(0), cfg)

    def loss_fn(p, b, rng):
        a, bb, c = pretrain.forward_vsm(p, cfg, vsm, b, rng=rng,
                                        train=train, dtype=jnp.bfloat16)
        return a + bb + c, {}

    spec = TrainSpec(learning_rate=3e-5, warmup_steps=10000,
                     num_train_steps=100000, grad_norm=2.0)
    step = make_train_step(loss_fn, spec, donate=True)
    state = TrainState.create(params)
    batch_d = {k: jnp.asarray(v)
               for k, v in synthetic.vsm_batch(shape).items()}
    rng = jax.random.PRNGKey(1)

    t_c0 = time.perf_counter()
    for i in range(3):
        state, metrics = step(state, batch_d, jax.random.fold_in(rng, i))
    float(metrics["loss"])
    compile_s = time.perf_counter() - t_c0

    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = step(state, batch_d, jax.random.fold_in(rng, i + 3))
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    ex_s = n_steps * batch / dt
    flops_ex = bench.analytic_train_flops_per_example(shape, cfg)
    vs = ex_s / (0.30 * 125e12 / flops_ex)
    tflops = ex_s * flops_ex / 1e12
    print(json.dumps({"variant": name, "ex_per_s": round(ex_s, 1),
                      "ms_per_step": round(1000 * dt / n_steps, 1),
                      "vs_baseline": round(vs, 3),
                      "achieved_tflops": round(tflops, 1),
                      "compile_s": round(compile_s, 1)}), flush=True)
    del state, params, batch_d
    return ex_s


VARIANTS = {
    "base": dict(),
    "remat": dict(remat=True),
    "pallas56": dict(pallas_min_lk=48),
    "pallas48_drop": dict(pallas_min_lk=48, drop_svmr=0.8),
    "nopallas": dict(pallas_min_lk=129),
    # measured: rolled scan = 129.7 ms vs 99.4 unrolled (bench shape)
    "rolled": dict(unroll=False),
    "drop_svmr": dict(drop_svmr=0.8),
    "b64": dict(batch=64),
    "b128": dict(batch=128),
    "eval_mode": dict(train=False),  # diagnostic: dropout+PRNG cost bound
    "combo": dict(remat=True, drop_svmr=0.8),
    "combo_b64": dict(remat=True, drop_svmr=0.8, batch=64),
    # A/B of the clip-level img-projection rewrite (models/model.py);
    # "base" runs the per-slot default, "clipproj" the rejected variant
    "slotproj": dict(clip_proj=False),
    "clipproj": dict(clip_proj=True),
    # NOTE: b128 crashes the tunnel's remote-compile helper (HTTP 500,
    # tpu_compile_helper exit 1) — run it last / standalone if at all
}


def main():
    enable_fast_rng()
    names = sys.argv[1:] or ["base", "remat", "pallas56", "drop_svmr",
                             "b64", "eval_mode"]
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    for n in names:
        run_variant(n, **VARIANTS[n])


if __name__ == "__main__":
    main()
