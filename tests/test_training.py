"""Training infra tests: AdamW groups, schedule, step builder, restore."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hero_tpu.config.model_config import tiny_hero_config
from hero_tpu.models import pretrain
from hero_tpu.parallel.mesh import get_mesh, shard_batch
from hero_tpu.training import optim as optim_lib
from hero_tpu.training import save as save_lib
from hero_tpu.training.optim import AdamWConfig
from hero_tpu.training.step import (TrainSpec, TrainState, make_train_step,
                                    make_sharded_train_step, shard_state)
from tests.test_backbone import tiny_batch


def test_masks():
    params = {"v_encoder": {"dense": {"kernel": jnp.ones((2, 2)),
                                      "bias": jnp.ones((2,))},
                            "ln": {"scale": jnp.ones((2,)),
                                   "bias": jnp.ones((2,))}},
              "head": {"out_ln": {"scale": jnp.ones((2,))},
                       "conv": {"kernel": jnp.ones((5,))}}}
    dm = optim_lib.no_decay_mask(params)
    assert dm["v_encoder"]["dense"]["kernel"] == 1.0
    assert dm["v_encoder"]["dense"]["bias"] == 0.0
    assert dm["v_encoder"]["ln"]["scale"] == 0.0
    assert dm["head"]["out_ln"]["scale"] == 0.0
    assert dm["head"]["conv"]["kernel"] == 1.0
    tm = optim_lib.top_lr_mask(params)
    assert tm["v_encoder"]["dense"]["kernel"] == 0.0
    assert tm["head"]["conv"]["kernel"] == 1.0


def test_warmup_linear_schedule():
    lr = optim_lib.get_lr(0, 1e-4, 100, 1000)
    assert float(lr) == pytest.approx(1e-8)
    assert float(optim_lib.get_lr(50, 1e-4, 100, 1000)) == pytest.approx(
        5e-5)
    assert float(optim_lib.get_lr(100, 1e-4, 100, 1000)) == pytest.approx(
        1e-4)
    assert float(optim_lib.get_lr(550, 1e-4, 100, 1000)) == pytest.approx(
        5e-5)
    assert float(optim_lib.get_lr(1000, 1e-4, 100, 1000)) == pytest.approx(
        1e-8)


def test_adamw_matches_torch():
    import torch
    torch.manual_seed(0)
    w0 = np.random.RandomState(0).randn(4, 3).astype(np.float32)
    g = np.random.RandomState(1).randn(4, 3).astype(np.float32)
    # torch reference implementation (HF AdamW, decoupled wd, bias corr)
    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    m = torch.zeros_like(p)
    v = torch.zeros_like(p)
    lr, b1, b2, eps, wd = 1e-3, 0.9, 0.98, 1e-6, 0.01
    pt = p.data.clone()
    for step in range(1, 4):
        gt = torch.tensor(g)
        m = b1 * m + (1 - b1) * gt
        v = b2 * v + (1 - b2) * gt * gt
        denom = v.sqrt() + eps
        sf = lr * ((1 - b2 ** step) ** 0.5) / (1 - b1 ** step)
        pt = pt - sf * m / denom
        pt = pt - lr * wd * pt  # decay after the step (adamw.py:104)

    params = {"head": {"dense": {"kernel": jnp.asarray(w0)}}}
    grads = {"head": {"dense": {"kernel": jnp.asarray(g)}}}
    state = optim_lib.adamw_init(params)
    cfg = AdamWConfig(beta1=b1, beta2=b2, eps=eps, weight_decay=wd)
    for _ in range(3):
        params, state = optim_lib.adamw_update(grads, state, params, lr,
                                               cfg)
    np.testing.assert_allclose(
        np.asarray(params["head"]["dense"]["kernel"]), pt.numpy(),
        rtol=1e-5, atol=1e-6)


def _vsm_loss_fn(cfg, vsm):
    def loss_fn(params, batch, rng):
        a, b, c = pretrain.forward_vsm(params, cfg, vsm, batch, rng=rng,
                                       train=True)
        loss = a + b + c
        return loss, {"loss_st_ed": a, "loss_neg_ctx": b, "loss_neg_q": c}
    return loss_fn


def test_train_step_decreases_loss():
    cfg = tiny_hero_config()
    vsm = pretrain.VsmConfig(lw_neg_ctx=1.0, lw_neg_q=1.0, lw_st_ed=0.01)
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(0), cfg)
    state = TrainState.create(params)
    spec = TrainSpec(learning_rate=5e-3, warmup_steps=1,
                     num_train_steps=1000, grad_norm=2.0)
    step = make_train_step(_vsm_loss_fn(cfg, vsm), spec, donate=False)
    batch = tiny_batch(cfg)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.global_step) == 8


def test_accum_steps_equivalent_batch():
    cfg = tiny_hero_config()
    vsm = pretrain.VsmConfig(lw_neg_ctx=1.0, lw_neg_q=1.0, lw_st_ed=0.0)
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(1), cfg)
    spec = TrainSpec(learning_rate=1e-3, warmup_steps=1,
                     num_train_steps=100)
    batch = tiny_batch(cfg)
    stacked = jax.tree.map(lambda x: jnp.stack([x, x]), batch)
    step = make_train_step(_vsm_loss_fn(cfg, vsm), spec, accum_steps=2,
                           donate=False)
    state = TrainState.create(params)
    state, metrics = step(state, stacked, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_sharded_train_step():
    cfg = tiny_hero_config()
    vsm = pretrain.VsmConfig(lw_neg_ctx=1.0, lw_neg_q=1.0, lw_st_ed=0.01)
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(2), cfg)
    mesh = get_mesh()
    n_dev = len(mesh.devices.flat)
    spec = TrainSpec(learning_rate=1e-3, warmup_steps=1,
                     num_train_steps=100)
    step = make_sharded_train_step(_vsm_loss_fn(cfg, vsm), spec, mesh)
    state = shard_state(TrainState.create(params), mesh)
    batch = tiny_batch(cfg, B=n_dev)
    batch = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
    state, metrics = step(state, batch, jax.device_put(
        jax.random.PRNGKey(0), jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec())))
    assert np.isfinite(float(metrics["loss"]))


def test_restore_roundtrip(tmp_path):
    cfg = tiny_hero_config()
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(3), cfg)
    state = TrainState.create(params)
    state = TrainState(params=state.params, opt=state.opt,
                       global_step=jnp.asarray(7, jnp.int32))
    restorer = save_lib.TrainingRestorer(str(tmp_path), {"lr": 1e-4})
    restorer.save(state)
    assert restorer.can_restore()
    restored = restorer.restore(state)
    assert int(restored.global_step) == 7
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # hps mismatch must refuse
    with pytest.raises(AssertionError):
        save_lib.TrainingRestorer(str(tmp_path), {"lr": 5e-4})


def test_model_saver_roundtrip(tmp_path):
    params = {"a": {"b": jnp.ones((3, 2)), "c": jnp.zeros((4,))}}
    saver = save_lib.ModelSaver(str(tmp_path))
    path = saver.save(params, 10)
    loaded = save_lib.load_params(path)
    np.testing.assert_array_equal(loaded["a"]["b"],
                                  np.asarray(params["a"]["b"]))
    assert "__vocab_padded__" not in loaded.get("a", {})


def test_model_saver_vocab_padded_marker(tmp_path):
    """Checkpoints record the ACTUAL pad decision threaded from checkpoint
    conversion/init (reference ModelSaver.save, utils/save.py:112-133) —
    never inferred from shapes, which would mislabel a naturally mult-of-8
    vocab as padded."""
    params = {"embeddings": {"word_emb": jnp.zeros((50272, 8))}}
    p1 = save_lib.ModelSaver(str(tmp_path), vocab_padded=True).save(
        params, 1)
    assert save_lib.checkpoint_vocab_padded(p1) is True
    # a naturally mult-of-8 vocab that was NOT padded stays False
    p2 = save_lib.ModelSaver(str(tmp_path), vocab_padded=False).save(
        params, 2)
    assert save_lib.checkpoint_vocab_padded(p2) is False
    # unknown provenance → marker omitted, not guessed
    p3 = save_lib.ModelSaver(str(tmp_path)).save(params, 3)
    assert save_lib.checkpoint_vocab_padded(p3) is None
    # marker never leaks back into the loaded pytree
    assert "__vocab_padded__" not in save_lib.load_params(p1)


def test_vocab_padded_threaded_from_conversion(tmp_path):
    """load_checkpoint_into reports the conversion's pad decision via its
    info out-param (ADVICE r2: don't infer from rows % 8)."""
    from hero_tpu.drivers.common import load_checkpoint_into
    src = {"embeddings": {"word_emb": np.zeros((48, 4), np.float32)}}
    p = save_lib.ModelSaver(str(tmp_path), vocab_padded=True).save(src, 0)
    info = {}
    init = {"embeddings": {"word_emb": jnp.zeros((48, 4))}}
    load_checkpoint_into(init, p, info=info)
    assert info["vocab_padded"] is True
    info2 = {}
    p2 = save_lib.ModelSaver(str(tmp_path)).save(src, 1)
    load_checkpoint_into(init, p2, info=info2)
    assert "vocab_padded" not in info2


def test_tensor_parallel_train_step():
    """DP×TP on a 2x4 virtual mesh: the sharded step compiles, runs, and
    matches the replicated step numerically."""
    from hero_tpu.parallel.mesh import get_2d_mesh, shard_task_batch
    cfg = tiny_hero_config()
    vsm = pretrain.VsmConfig(lw_neg_ctx=1.0, lw_neg_q=1.0, lw_st_ed=0.01)
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(5), cfg)
    spec = TrainSpec(learning_rate=1e-3, warmup_steps=1,
                     num_train_steps=100)

    def loss_fn(p, batch, rng):
        a, b, c = pretrain.forward_vsm(p, cfg, vsm, batch, rng=rng,
                                       train=False)
        return a + b + c, {}

    batch_np = {k: np.asarray(v) for k, v in tiny_batch(cfg, B=2).items()}

    mesh2d = get_2d_mesh(2, 4)
    step_tp = make_sharded_train_step(loss_fn, spec, mesh2d, donate=False)
    state_tp = shard_state(TrainState.create(params), mesh2d)
    # verify weights really are sharded over the model axis
    k = state_tp.params["v_encoder"]["f_encoder"]["encoder"]["layers"][
        "ffn"]["intermediate"]["kernel"]
    assert "model" in str(k.sharding.spec)
    b_tp = shard_task_batch(batch_np, mesh2d)
    state_tp, m_tp = step_tp(state_tp, b_tp,
                             jax.random.PRNGKey(0))

    from hero_tpu.parallel.mesh import get_mesh
    mesh1d = get_mesh(2)
    step_dp = make_sharded_train_step(loss_fn, spec, mesh1d, donate=False)
    state_dp = shard_state(TrainState.create(params), mesh1d)
    b_dp = shard_task_batch(batch_np, mesh1d)
    state_dp, m_dp = step_dp(state_dp, b_dp, jax.random.PRNGKey(0))

    assert float(m_tp["loss"]) == pytest.approx(float(m_dp["loss"]),
                                                rel=2e-4)
    # params after one step agree
    a = jax.device_get(state_tp.params["head"]["video_query_linear"]
                       ["kernel"])
    b = jax.device_get(state_dp.params["head"]["video_query_linear"]
                       ["kernel"])
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_sequence_parallel_train_step():
    """DP×SP on a 4x2 virtual mesh: with enable_seq_parallel, the temporal
    encoder's frame axis shards over 'seq' (activations really carry the
    seq axis), and the step matches the plain-DP step numerically —
    XLA inserts the attention gathers (beyond-reference capability;
    the reference caps sequence length instead, SURVEY §5.7)."""
    from hero_tpu.parallel.mesh import (enable_seq_parallel, get_mesh,
                                        get_seq_mesh, shard_task_batch)
    cfg = tiny_hero_config()
    vsm = pretrain.VsmConfig(lw_neg_ctx=1.0, lw_neg_q=1.0, lw_st_ed=0.01)
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(5), cfg)
    spec = TrainSpec(learning_rate=1e-3, warmup_steps=1,
                     num_train_steps=100)

    def loss_fn(p, batch, rng):
        a, b, c = pretrain.forward_vsm(p, cfg, vsm, batch, rng=rng,
                                       train=False)
        return a + b + c, {}

    from hero_tpu.models import model as backbone
    batch_np = {k: np.asarray(v) for k, v in tiny_batch(cfg, B=4).items()}

    mesh_sp = get_seq_mesh(4, 2)
    enable_seq_parallel(mesh_sp)
    try:
        step_sp = make_sharded_train_step(loss_fn, spec, mesh_sp,
                                          donate=False)
        state_sp = shard_state(TrainState.create(params), mesh_sp)
        b_sp = shard_task_batch(batch_np, mesh_sp)
        state_sp, m_sp = step_sp(state_sp, b_sp, jax.random.PRNGKey(0))
        # the constrained activations really shard over ('data', 'seq')
        fwd = jax.jit(lambda p, b: backbone.forward_repr(
            p["v_encoder"], cfg, b))
        out = fwd(state_sp.params, b_sp)
        assert "seq" in str(out.sharding.spec), out.sharding
    finally:
        enable_seq_parallel(None)

    mesh1d = get_mesh(4)
    step_dp = make_sharded_train_step(loss_fn, spec, mesh1d, donate=False)
    state_dp = shard_state(TrainState.create(params), mesh1d)
    b_dp = shard_task_batch(batch_np, mesh1d)
    state_dp, m_dp = step_dp(state_dp, b_dp, jax.random.PRNGKey(0))

    assert float(m_sp["loss"]) == pytest.approx(float(m_dp["loss"]),
                                                rel=2e-4)
    a = jax.device_get(state_sp.params["head"]["video_query_linear"]
                       ["kernel"])
    b = jax.device_get(state_dp.params["head"]["video_query_linear"]
                       ["kernel"])
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_zero1_optimizer_sharding():
    """ZeRO-1 on the 8-device virtual mesh: the AdamW moments really shard
    over 'data', and 3 steps match the replicated-optimizer step exactly
    (the GSPMD partitioning only changes WHERE the update runs)."""
    from hero_tpu.parallel.mesh import shard_task_batch
    cfg = tiny_hero_config()
    vsm = pretrain.VsmConfig(lw_neg_ctx=1.0, lw_neg_q=1.0, lw_st_ed=0.01)
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(7), cfg)
    spec = TrainSpec(learning_rate=1e-3, warmup_steps=1,
                     num_train_steps=100)
    mesh = get_mesh(8)
    loss_fn = _vsm_loss_fn(cfg, vsm)
    batch_np = {k: np.asarray(v) for k, v in tiny_batch(cfg, B=8).items()}
    rep_rng = lambda i: jax.device_put(
        jax.random.PRNGKey(i), jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))

    step_z = make_sharded_train_step(loss_fn, spec, mesh, donate=False,
                                     zero1=True)
    state_z = shard_state(TrainState.create(params), mesh, zero1=True)
    # moments really are sharded over the data axis; params replicated
    mu_leaf = state_z.opt.mu["v_encoder"]["f_encoder"]["encoder"][
        "layers"]["ffn"]["intermediate"]["kernel"]
    assert "data" in str(mu_leaf.sharding.spec), mu_leaf.sharding
    p_leaf = state_z.params["v_encoder"]["f_encoder"]["encoder"][
        "layers"]["ffn"]["intermediate"]["kernel"]
    assert p_leaf.sharding.is_fully_replicated

    step_dp = make_sharded_train_step(loss_fn, spec, mesh, donate=False)
    state_dp = shard_state(TrainState.create(params), mesh)

    b_z = shard_task_batch(batch_np, mesh)
    b_dp = shard_task_batch(batch_np, mesh)
    for i in range(3):
        state_z, m_z = step_z(state_z, b_z, rep_rng(i))
        state_dp, m_dp = step_dp(state_dp, b_dp, rep_rng(i))
    # output moments keep the ZeRO-1 sharding step over step
    mu_leaf = state_z.opt.mu["v_encoder"]["f_encoder"]["encoder"][
        "layers"]["ffn"]["intermediate"]["kernel"]
    assert "data" in str(mu_leaf.sharding.spec), mu_leaf.sharding
    assert float(m_z["loss"]) == pytest.approx(float(m_dp["loss"]),
                                               rel=1e-5)
    a = jax.device_get(state_z.params["head"]["video_query_linear"]
                       ["kernel"])
    b = jax.device_get(state_dp.params["head"]["video_query_linear"]
                       ["kernel"])
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
    nz = jax.device_get(state_z.opt.nu["head"]["video_query_linear"]
                        ["kernel"])
    nd = jax.device_get(state_dp.opt.nu["head"]["video_query_linear"]
                        ["kernel"])
    np.testing.assert_allclose(nz, nd, rtol=1e-5, atol=1e-9)


def test_vsm_global_batch_semantics_under_sharding():
    """The VSM in-batch negative pool must be the GLOBAL batch: computing
    the loss on a batch sharded over 8 devices must equal the same batch
    on 1 device (this is what replaces the reference's differentiable
    Horovod allgather, model/pretrain.py:427-451)."""
    from hero_tpu.parallel.mesh import get_mesh, shard_task_batch
    cfg = tiny_hero_config()
    vsm = pretrain.VsmConfig(lw_neg_ctx=1.0, lw_neg_q=1.0, lw_st_ed=0.01)
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(9), cfg)
    batch = {k: np.asarray(v) for k, v in tiny_batch(cfg, B=8).items()}

    def loss(p, b):
        a, x, y = pretrain.forward_vsm(p, cfg, vsm, b)
        return jnp.stack([a, x, y])

    single = jax.jit(loss)(params, {k: jnp.asarray(v)
                                    for k, v in batch.items()})
    mesh = get_mesh(8)
    sharded_batch = shard_task_batch(batch, mesh)
    rep = jax.device_put(params, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    sharded = jax.jit(loss)(rep, sharded_batch)
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               rtol=1e-4, atol=1e-5)


def test_drop_svmr_prob_skips_span_loss():
    """With drop_svmr_prob=0.8 the span loss must be exactly zero on ~80%
    of steps (reference model/pretrain.py:73-78), under ONE compilation
    (the Bernoulli is traced; lax.cond selects the branch)."""
    cfg = tiny_hero_config()
    vsm = pretrain.VsmConfig(lw_neg_ctx=1.0, lw_neg_q=1.0, lw_st_ed=0.01,
                             drop_svmr_prob=0.8)
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(3), cfg)
    batch = tiny_batch(cfg)

    @jax.jit
    def span_loss(p, b, rng):
        a, _, _ = pretrain.forward_vsm(p, cfg, vsm, b, rng=rng, train=True)
        return a

    with jax.log_compiles(False):
        vals = [float(span_loss(params, batch, jax.random.PRNGKey(i)))
                for i in range(50)]
    n_zero = sum(v == 0.0 for v in vals)
    # Bernoulli(0.8) over 50 draws: [28, 48] is a ~6-sigma window
    assert 28 <= n_zero <= 48, n_zero
    assert any(v > 0.0 for v in vals)
    # eval mode never drops (reference: `or not self.training`)
    a_eval, _, _ = pretrain.forward_vsm(params, cfg, vsm, batch,
                                        rng=jax.random.PRNGKey(0),
                                        train=False)
    assert float(a_eval) > 0.0


def test_drop_svmr_single_compilation():
    cfg = tiny_hero_config()
    vsm = pretrain.VsmConfig(lw_neg_ctx=1.0, lw_neg_q=1.0, lw_st_ed=0.01,
                             drop_svmr_prob=0.5)
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(3), cfg)
    batch = tiny_batch(cfg)

    n_traces = 0

    def loss(p, b, rng):
        nonlocal n_traces
        n_traces += 1
        a, x, y = pretrain.forward_vsm(p, cfg, vsm, b, rng=rng, train=True)
        return a + x + y

    f = jax.jit(loss)
    for i in range(6):
        float(f(params, batch, jax.random.PRNGKey(i)))
    assert n_traces == 1, n_traces


def test_sampled_neg_branch():
    """use_all_neg=False draws ONE negative per query/video (reference
    get_sampled_neg_scores, model/pretrain.py:296-318).  The sampled
    hinge loss per query must lie within [min, max] of the all-neg
    per-column losses, and losses must be finite and generally nonzero."""
    from hero_tpu.models.pretrain import video_level_loss
    r = np.random.RandomState(0)
    nq, nv, Q = 12, 6, 2
    scores = jnp.asarray(r.randn(nq, nv).astype(np.float32) * 0.3)
    q_mask = jnp.ones((nq,), jnp.float32)
    vsm_all = pretrain.VsmConfig(lw_neg_ctx=1.0, lw_neg_q=1.0,
                                 use_all_neg=True)
    vsm_smp = pretrain.VsmConfig(lw_neg_ctx=1.0, lw_neg_q=1.0,
                                 use_all_neg=False)
    kw = dict(use_hard_negative=jnp.asarray(False),
              hard_pool_size=jnp.asarray(20),
              hard_neg_weight=jnp.asarray(10.0))
    l_all = video_level_loss(scores, q_mask, Q, vsm_all, **kw)
    outs = [video_level_loss(scores, q_mask, Q, vsm_smp, **kw,
                             rng=jax.random.PRNGKey(i)) for i in range(8)]
    for l_ctx, l_q in outs:
        assert np.isfinite(float(l_ctx)) and np.isfinite(float(l_q))
    # different rng -> different sampled losses (not a constant path)
    ctxs = {round(float(c), 6) for c, _ in outs}
    assert len(ctxs) > 1, ctxs
    # sampled loss is a mean of per-row single-negative hinges, each of
    # which is bounded by the max all-neg hinge + margin slack
    assert float(l_all[0]) >= 0 and all(float(c) >= 0 for c, _ in outs)


def test_video_level_loss_single_video_is_zero():
    """Nv==1: no negatives exist; reference returns zeros
    (model/pretrain.py:214-216) — must not be NaN."""
    from hero_tpu.models.pretrain import video_level_loss
    scores = jnp.asarray(np.random.RandomState(0).randn(4, 1)
                         .astype(np.float32))
    l_ctx, l_q = video_level_loss(
        scores, jnp.ones((4,), jnp.float32), 4,
        pretrain.VsmConfig(lw_neg_ctx=1.0, lw_neg_q=1.0),
        use_hard_negative=jnp.asarray(False),
        hard_pool_size=jnp.asarray(20),
        hard_neg_weight=jnp.asarray(10.0))
    assert float(l_ctx) == 0.0 and float(l_q) == 0.0


def test_poisoned_batch_iter_crashes_run_training(tmp_path):
    """A data-pipeline exception mid-run must CRASH training, not end it
    cleanly: the old PrefetchLoader swallowed worker exceptions via its
    stop sentinel, so a preemptible run that died at step N masqueraded as
    a completed run ("training done" + final checkpoint)."""
    from types import SimpleNamespace
    from hero_tpu.drivers import common as dcommon

    cfg = tiny_hero_config()
    vsm = pretrain.VsmConfig(lw_neg_ctx=1.0, lw_neg_q=1.0, lw_st_ed=0.0)
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(0), cfg)
    mesh = get_mesh()
    n_dev = len(mesh.devices.flat)
    spec = TrainSpec(learning_rate=1e-3, warmup_steps=1,
                     num_train_steps=100)

    def loss_fn(p, batch, rng):
        a, b, c = pretrain.forward_vsm(p, cfg, vsm, batch, rng=rng,
                                       train=True)
        return a + b + c, {}

    step = make_sharded_train_step(loss_fn, spec, mesh)
    state = shard_state(TrainState.create(params), mesh)
    np_batch = {k: np.asarray(v)
                for k, v in tiny_batch(cfg, B=n_dev).items()}

    def poisoned():
        yield "vsm", np_batch
        yield "vsm", np_batch
        raise ValueError("poisoned batch assembly")

    opts = SimpleNamespace(output_dir=None, seed=0,
                           gradient_accumulation_steps=1,
                           valid_steps=10_000, save_steps=10_000,
                           num_train_steps=50)
    with pytest.raises(RuntimeError, match="prefetch worker failed"):
        dcommon.run_training(opts, mesh, step, state, poisoned())


def test_async_checkpoint_writer_orders_and_raises(tmp_path):
    """Jobs run in order on the writer thread; a failing job re-raises on
    flush (a dying disk must crash training, not drop checkpoints)."""
    w = save_lib.AsyncCheckpointWriter()
    order = []
    w.submit(lambda: order.append(1))
    w.submit(lambda: order.append(2))
    w.flush()
    assert order == [1, 2]
    w.submit(lambda: (_ for _ in ()).throw(OSError("disk full")))
    with pytest.raises(RuntimeError, match="checkpoint write failed"):
        w.flush()
    w.close()


def test_async_checkpoint_writer_backpressure():
    """submit() waits for the PREVIOUS write to finish: at most one job
    (and its pinned host snapshot) lives inside the writer at a time."""
    import threading
    import time
    w = save_lib.AsyncCheckpointWriter()
    release = threading.Event()
    done = []
    w.submit(lambda: (release.wait(10), done.append(1)))
    t = threading.Thread(target=lambda: (time.sleep(0.2), release.set()))
    t.start()
    w.submit(lambda: done.append(2))   # blocks until job 1 completes
    assert done == [1]
    w.flush()
    t.join()
    assert done == [1, 2]
    w.close()


def test_model_saver_async(tmp_path):
    params = {"a": {"b": jnp.ones((3, 2))}}
    w = save_lib.AsyncCheckpointWriter()
    saver = save_lib.ModelSaver(str(tmp_path), writer=w)
    path = saver.save(params, 5)
    saver.flush()
    loaded = save_lib.load_params(path)
    np.testing.assert_array_equal(loaded["a"]["b"], np.ones((3, 2)))
    assert not os.path.exists(path + ".tmp")
    w.close()


def test_restore_falls_back_to_backup_on_corrupt(tmp_path):
    """A truncated restore.npz (crash mid-write before atomic renames, or
    torn disk) must fall back to restore_backup.npz, not crash resume."""
    cfg = tiny_hero_config()
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(3), cfg)
    state = TrainState.create(params)
    restorer = save_lib.TrainingRestorer(str(tmp_path), {"lr": 1e-4})
    restorer.save(state, global_step=3)        # -> save_path
    restorer.save(state, global_step=4)        # save->backup, new save
    # corrupt the primary
    with open(restorer.save_path, "wb") as f:
        f.write(b"not a zipfile")
    restored = restorer.restore(state)
    assert int(restored.global_step) == 3      # from the backup
    # both unreadable -> loud error
    with open(restorer.backup_path, "wb") as f:
        f.write(b"junk")
    with pytest.raises(RuntimeError, match="no readable restore"):
        restorer.restore(state)


def test_sigterm_preempts_run_training_with_checkpoint(tmp_path):
    """SIGTERM mid-run: finish the in-flight step, write restore.npz, and
    return cleanly at a step < num_train_steps (preemptible-VM behavior;
    beyond the reference, which only resumes from periodic saves)."""
    import signal
    import threading
    from types import SimpleNamespace
    from hero_tpu.drivers import common as dcommon

    if threading.current_thread() is not threading.main_thread():
        pytest.skip("signal handler requires main thread")

    cfg = tiny_hero_config()
    vsm = pretrain.VsmConfig(lw_neg_ctx=1.0, lw_neg_q=1.0, lw_st_ed=0.0)
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(0), cfg)
    mesh = get_mesh()
    n_dev = len(mesh.devices.flat)
    spec = TrainSpec(learning_rate=1e-3, warmup_steps=1,
                     num_train_steps=1000)

    def loss_fn(p, batch, rng):
        a, b, c = pretrain.forward_vsm(p, cfg, vsm, batch, rng=rng,
                                       train=True)
        return a + b + c, {}

    step = make_sharded_train_step(loss_fn, spec, mesh)
    state = shard_state(TrainState.create(params), mesh)
    np_batch = {k: np.asarray(v)
                for k, v in tiny_batch(cfg, B=n_dev).items()}

    def batches():
        n = 0
        while True:
            n += 1
            if n == 3:
                os.kill(os.getpid(), signal.SIGTERM)
            yield "vsm", np_batch

    restorer = save_lib.TrainingRestorer(str(tmp_path), {"lr": 1e-3})
    opts = SimpleNamespace(output_dir=None, seed=0,
                           gradient_accumulation_steps=1,
                           valid_steps=10_000, save_steps=10_000,
                           num_train_steps=1000)
    out = dcommon.run_training(opts, mesh, step, state, batches(),
                               restorer=restorer)
    assert out is not None
    assert os.path.exists(restorer.save_path)
    with np.load(restorer.save_path) as z:
        saved_step = int(z["__step__"])
    assert 0 < saved_step < 1000
    restored = restorer.restore(state)
    assert int(restored.global_step) == saved_step
