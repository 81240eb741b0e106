"""Pipeline parallelism (parallel/pipeline.py): GPipe over the stacked
encoder layer axis — a capability beyond the reference's DP-only design
(SURVEY §2.7).  With dropout off, the pipelined stack is numerically
identical to the sequential ``lax.scan`` (same layer order; ppermute /
psum add no arithmetic), so forward, gradients, and the full VSM train
step are checked exactly against the plain path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hero_tpu.config.model_config import (TransformerConfig,
                                          tiny_hero_config)
from hero_tpu.models import pretrain, transformer
from hero_tpu.parallel import pipeline as pp
from hero_tpu.parallel.mesh import get_mesh, shard_task_batch
from hero_tpu.training.step import (TrainSpec, TrainState,
                                    make_sharded_train_step, shard_state)
from tests.test_backbone import tiny_batch


def _enc_cfg(layers=4):
    return TransformerConfig(hidden_size=32, num_hidden_layers=layers,
                             num_attention_heads=4, intermediate_size=64,
                             max_position_embeddings=64, vocab_size=64,
                             type_vocab_size=2)


def test_pipelined_encoder_matches_sequential():
    """Forward + grads of the pipelined stack == sequential scan (4 layers
    over 2 stages, 2 microbatches, data=2)."""
    cfg = _enc_cfg(layers=4)
    params = transformer.init_encoder(jax.random.PRNGKey(0), cfg)
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(4, 10, 32), jnp.float32)
    mask = jnp.asarray((r.rand(4, 10) > 0.2), jnp.float32)

    def loss(p, m):
        return jnp.sum(transformer.encoder(p, x, m, cfg) ** 2)

    ref, ref_grads = jax.value_and_grad(loss)(params, mask)

    mesh = pp.get_pp_mesh(2, 2)
    pp.enable_pipeline(mesh, n_microbatches=2)
    try:
        got, got_grads = jax.jit(jax.value_and_grad(loss))(params, mask)
        # stage-sharded param placement really splits the layer axis
        spec = pp.pp_param_spec(params, 2)
        k = spec["layers"]["ffn"]["intermediate"]["kernel"]
        assert k[0] == "stage", spec
    finally:
        pp.enable_pipeline(None)

    assert float(got) == pytest.approx(float(ref), rel=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4,
                                                atol=1e-5),
        jax.device_get(got_grads), jax.device_get(ref_grads))


def test_pipelined_encoder_no_mask_and_uneven_stack():
    """mask=None works; a stack not divisible by the stage count falls
    back to the sequential path (active() is per-stack)."""
    cfg = _enc_cfg(layers=4)
    params = transformer.init_encoder(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(np.random.RandomState(1).randn(4, 8, 32), jnp.float32)
    ref = transformer.encoder(params, x, None, cfg)

    mesh = pp.get_pp_mesh(2, 2)
    pp.enable_pipeline(mesh, n_microbatches=2)
    try:
        got = jax.jit(lambda p: transformer.encoder(p, x, None, cfg))(
            params)
        assert pp.active(4) and not pp.active(3) and not pp.active(1)
    finally:
        pp.enable_pipeline(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_pipelined_encoder_train_mode_dropout():
    """train=True through the pipeline: per-layer keys fold in the
    microbatch index (a valid, different stream from the sequential
    trace) — loss and grads are finite and nonzero."""
    cfg = _enc_cfg(layers=4)
    params = transformer.init_encoder(jax.random.PRNGKey(3), cfg)
    x = jnp.asarray(np.random.RandomState(3).randn(4, 10, 32), jnp.float32)
    mask = jnp.ones((4, 10), jnp.float32)
    mesh = pp.get_pp_mesh(2, 2)
    pp.enable_pipeline(mesh, n_microbatches=2)
    try:
        def loss(p):
            return jnp.sum(transformer.encoder(
                p, x, mask, cfg, rng=jax.random.PRNGKey(7),
                train=True) ** 2)
        v, g = jax.jit(jax.value_and_grad(loss))(params)
    finally:
        pp.enable_pipeline(None)
    assert np.isfinite(float(v))
    gn = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_driver_mesh_builds_pp_mesh():
    """--pp_stages plumbs through driver_mesh: (data, stage) mesh built,
    pipeline toggle enabled, zero1 rejected."""
    import argparse
    opts = argparse.Namespace(pp_stages=2, pp_microbatches=2, zero1=False)
    try:
        mesh = pp.driver_mesh(opts, global_batch=8)
        assert mesh.axis_names == ("data", "stage")
        assert mesh.shape["stage"] == 2 and mesh.shape["data"] == 4
        assert pp.active(4) and pp.n_stages() == 2
    finally:
        pp.enable_pipeline(None)
    opts_dp = argparse.Namespace(pp_stages=1, zero1=False)
    mesh_dp = pp.driver_mesh(opts_dp, global_batch=8)
    assert mesh_dp.axis_names == ("data",)
    assert not pp.active(4)
    with pytest.raises(AssertionError):
        pp.driver_mesh(argparse.Namespace(pp_stages=2, zero1=True), 8)


def test_pipeline_parallel_train_step():
    """DP×PP on a 2x2 virtual mesh: the f-encoder (2 layers) pipelines
    over 2 stages, its weights are stage-sharded, and one full VSM train
    step matches the plain-DP step numerically."""
    cfg = tiny_hero_config()
    vsm = pretrain.VsmConfig(lw_neg_ctx=1.0, lw_neg_q=1.0, lw_st_ed=0.01)
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(5), cfg)
    spec = TrainSpec(learning_rate=1e-3, warmup_steps=1,
                     num_train_steps=100)

    def loss_fn(p, batch, rng):
        a, b, c = pretrain.forward_vsm(p, cfg, vsm, batch, rng=rng,
                                       train=False)
        return a + b + c, {}

    batch_np = {k: np.asarray(v) for k, v in tiny_batch(cfg, B=4).items()}

    mesh_pp = pp.get_pp_mesh(2, 2)
    pp.enable_pipeline(mesh_pp, n_microbatches=2)
    try:
        step_pp = make_sharded_train_step(loss_fn, spec, mesh_pp,
                                          donate=False)
        state_pp = shard_state(TrainState.create(params), mesh_pp)
        # f-encoder stacked weights (2 layers) live one-per-stage
        k = state_pp.params["v_encoder"]["f_encoder"]["encoder"]["layers"][
            "ffn"]["intermediate"]["kernel"]
        assert "stage" in str(k.sharding.spec), k.sharding
        b_pp = shard_task_batch(batch_np, mesh_pp)
        state_pp, m_pp = step_pp(state_pp, b_pp, jax.random.PRNGKey(0))
    finally:
        pp.enable_pipeline(None)

    mesh1d = get_mesh(2)
    step_dp = make_sharded_train_step(loss_fn, spec, mesh1d, donate=False)
    state_dp = shard_state(TrainState.create(params), mesh1d)
    b_dp = shard_task_batch(batch_np, mesh1d)
    state_dp, m_dp = step_dp(state_dp, b_dp, jax.random.PRNGKey(0))

    assert float(m_pp["loss"]) == pytest.approx(float(m_dp["loss"]),
                                                rel=2e-4)
    a = jax.device_get(state_pp.params["head"]["video_query_linear"]
                       ["kernel"])
    b = jax.device_get(state_dp.params["head"]["video_query_linear"]
                       ["kernel"])
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
