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


def test_pipelined_encoder_packed_segment_mask():
    """PP × --pack_subs: the pipeline's microbatch split reshapes the
    mask rank-generically, so a packed batch's 3-D (N, L, S) segment
    one-hot must ride through the ppermute schedule unchanged — pinned
    exactly against the sequential scan with the same mask."""
    cfg = _enc_cfg(layers=4)
    params = transformer.init_encoder(jax.random.PRNGKey(5), cfg)
    r = np.random.RandomState(5)
    x = jnp.asarray(r.randn(4, 12, 32), jnp.float32)
    # 3 segments per row + invalid (-1) tail slots
    ids = np.full((4, 12), -1, np.int32)
    for b in range(4):
        ids[b, 0:4] = 0
        ids[b, 4:9] = 1
        ids[b, 9:11] = 2
    seg = jax.nn.one_hot(jnp.asarray(ids), 4, dtype=jnp.float32)

    def loss(p, m):
        return jnp.sum(transformer.encoder(p, x, m, cfg) ** 2)

    ref, ref_grads = jax.value_and_grad(loss)(params, seg)
    mesh = pp.get_pp_mesh(2, 2)
    pp.enable_pipeline(mesh, n_microbatches=2)
    try:
        got, got_grads = jax.jit(jax.value_and_grad(loss))(params, seg)
    finally:
        pp.enable_pipeline(None)
    assert float(got) == pytest.approx(float(ref), rel=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4,
                                                atol=1e-5),
        jax.device_get(got_grads), jax.device_get(ref_grads))


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


def test_pipeline_dropout_stream_unbiased():
    """VERDICT r3 #4: the PP dropout stream (per-layer key folded with the
    microbatch index) is a DIFFERENT stream from the sequential trace but
    statistically equivalent — demonstrated, not asserted.  Statistic:
    mean squared train-vs-eval perturbation per rng key; a biased stream
    (e.g. the arithmetic-shift PRNG bug that turned rate 0.1 into 0.6,
    ops/attention.py:_dropout_keep_mask) shifts this by several x."""
    cfg = _enc_cfg(layers=4)
    params = transformer.init_encoder(jax.random.PRNGKey(0), cfg)
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(4, 10, 32), jnp.float32)
    mask = jnp.ones((4, 10), jnp.float32)
    eval_out = transformer.encoder(params, x, mask, cfg)
    keys = [jax.random.PRNGKey(100 + i) for i in range(48)]

    # NB: distinct closures — pjit caches on function identity, so reusing
    # one function object across the toggle would silently reuse the
    # sequential trace
    f_seq = jax.jit(lambda p, k: jnp.mean((transformer.encoder(
        p, x, mask, cfg, rng=k, train=True) - eval_out) ** 2))
    seq = np.array([float(f_seq(params, k)) for k in keys])

    mesh = pp.get_pp_mesh(2, 2)
    pp.enable_pipeline(mesh, n_microbatches=2)
    try:
        f_pp = jax.jit(lambda p, k: jnp.mean((transformer.encoder(
            p, x, mask, cfg, rng=k, train=True) - eval_out) ** 2))
        ppv = np.array([float(f_pp(params, k)) for k in keys])
    finally:
        pp.enable_pipeline(None)

    # different stream: no key reproduces the sequential draw ...
    assert not np.any(seq == ppv)
    # ... but the same distribution: per-key spread is ~6% (std/mean), so
    # the means over 48 keys agree well inside 5% iff the dropout rate and
    # mask structure match (measured rel diff 0.9%)
    assert abs(seq.mean() - ppv.mean()) < 0.05 * seq.mean(), (
        seq.mean(), ppv.mean())


def test_pipeline_parallel_grad_accum_step():
    """VERDICT r3 #4: PP × gradient accumulation — the lax.scan'd accum
    window wraps the shard_map pipeline; one accum=2 train step under
    DP×PP matches the plain-DP accum=2 step numerically (dropout off)."""
    cfg = tiny_hero_config()
    vsm = pretrain.VsmConfig(lw_neg_ctx=1.0, lw_neg_q=1.0, lw_st_ed=0.01)
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(5), cfg)
    spec = TrainSpec(learning_rate=1e-3, warmup_steps=1,
                     num_train_steps=100)

    def loss_fn(p, batch, rng):
        a, b, c = pretrain.forward_vsm(p, cfg, vsm, batch, rng=rng,
                                       train=False)
        return a + b + c, {}

    m0 = {k: np.asarray(v) for k, v in tiny_batch(cfg, B=4).items()}
    m1 = {k: np.asarray(v) for k, v in tiny_batch(cfg, B=4).items()}
    stacked = {k: np.stack([m0[k], m1[k]]) for k in m0}   # (accum=2, B, ...)

    mesh_pp = pp.get_pp_mesh(2, 2)
    pp.enable_pipeline(mesh_pp, n_microbatches=2)
    try:
        step_pp = make_sharded_train_step(loss_fn, spec, mesh_pp,
                                          accum_steps=2, donate=False)
        state_pp = shard_state(TrainState.create(params), mesh_pp)
        b_pp = shard_task_batch(stacked, mesh_pp, accum_steps=2)
        state_pp, m_pp = step_pp(state_pp, b_pp, jax.random.PRNGKey(0))
    finally:
        pp.enable_pipeline(None)

    mesh1d = get_mesh(2)
    step_dp = make_sharded_train_step(loss_fn, spec, mesh1d,
                                      accum_steps=2, donate=False)
    state_dp = shard_state(TrainState.create(params), mesh1d)
    b_dp = shard_task_batch(stacked, mesh1d, accum_steps=2)
    state_dp, m_dp = step_dp(state_dp, b_dp, jax.random.PRNGKey(0))

    assert float(m_pp["loss"]) == pytest.approx(float(m_dp["loss"]),
                                                rel=2e-4)
    a = jax.device_get(state_pp.params["head"]["video_query_linear"]
                       ["kernel"])
    b = jax.device_get(state_dp.params["head"]["video_query_linear"]
                       ["kernel"])
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


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
