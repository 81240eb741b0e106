"""Pipeline parallelism over the stacked encoder layer axis (GPipe).

A capability beyond the reference (SURVEY §2.7: the reference is
data-parallel only — one process per GPU, NCCL allreduce).  Because every
encoder stack in this codebase is stored with a leading layer axis and
executed with ``lax.scan`` (models/transformer.py), pipelining is natural
on TPU: shard the layer axis over a ``stage`` mesh axis, split the
per-data-shard batch into microbatches, and rotate activations stage →
stage+1 with ``lax.ppermute`` over ICI — the classic GPipe schedule
expressed as a ``shard_map`` + ``lax.scan`` over clock ticks, fully
compatible with jit/GSPMD and reverse-mode autodiff (ppermute transposes
to the inverse permutation, so the backward pipeline runs stage S-1 → 0
automatically).

Schedule (S stages, M microbatches, M + S - 1 ticks):

    tick t:   stage 0 ingests microbatch t (t < M); stage s > 0 consumes
              the activation ppermuted from stage s-1 at tick t-1; each
              stage runs its ``L/S`` local layers; the last stage writes
              microbatch t-(S-1) to the output buffer.

Only the last stage holds real outputs; the buffer is zeros elsewhere, so
a ``psum`` over ``stage`` replicates the result to every stage (its
transpose — identity — keeps the backward cheap).

Like :func:`hero_tpu.parallel.mesh.enable_seq_parallel`, activation is a
trace-time toggle so model code stays single-device-readable: when a
pipeline mesh is enabled, :func:`hero_tpu.models.transformer.encoder`
routes any stack whose depth is a multiple of the stage count through
:func:`pipelined_encoder`; shallower stacks (e.g. the 3-layer temporal
encoder under S=2) stay sequential and replicated.

Dropout note: under the pipeline, each microbatch draws its own per-layer
dropout mask (per-layer key folded with the microbatch index) — a valid
but different random stream from the sequential full-batch trace, so
train-mode losses are not bit-comparable across the toggle; eval-mode
(and any no-dropout) outputs are exact.  The multichip dryrun asserts
exact agreement with dropout off and the unit tests check gradients too.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from hero_tpu.parallel.mesh import DATA_AXIS

STAGE_AXIS = "stage"

_PIPELINE_MESH: Optional[Mesh] = None
_N_MICRO: int = 2


def get_pp_mesh(n_data: int, n_stage: int,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """(data, stage) mesh for DP×PP."""
    if devices is None:
        devices = jax.devices()
    assert n_data * n_stage <= len(devices)
    arr = np.asarray(devices[:n_data * n_stage]).reshape(n_data, n_stage)
    return Mesh(arr, (DATA_AXIS, STAGE_AXIS))


def enable_pipeline(mesh: Optional[Mesh], n_microbatches: int = 2) -> None:
    """Activate (or, with None, deactivate) pipeline parallelism for
    subsequently TRACED programs.  The mesh must carry a 'stage' axis."""
    global _PIPELINE_MESH, _N_MICRO
    assert mesh is None or STAGE_AXIS in mesh.axis_names
    assert n_microbatches >= 1
    _PIPELINE_MESH = mesh
    _N_MICRO = n_microbatches


def n_stages() -> int:
    return _PIPELINE_MESH.shape[STAGE_AXIS] if _PIPELINE_MESH else 1


def active(n_layers: int) -> bool:
    """True iff a pipeline mesh is enabled and an ``n_layers`` stack can
    be split evenly over its stages."""
    if _PIPELINE_MESH is None:
        return False
    s = _PIPELINE_MESH.shape[STAGE_AXIS]
    return s > 1 and n_layers >= s and n_layers % s == 0


def compatible(batch: int) -> bool:
    """True iff a ``batch``-row activation can shard over the pipeline
    mesh's data axis.  Encoders see many batch shapes besides the train
    batch (flattened sub rows, query pools, validation batches); shapes
    that don't split over ``data`` take the sequential scan instead
    (still correct — XLA gathers the stage-sharded weights)."""
    n_data = _PIPELINE_MESH.shape[DATA_AXIS]
    return batch >= n_data and batch % n_data == 0


def pp_param_spec(params: Any, n_stage: int) -> Any:
    """PartitionSpecs placing stacked encoder-layer leaves (leading layer
    axis divisible by the stage count) on ``P('stage', ...)``; everything
    else replicated.  Matches :func:`active`'s per-stack routing, so the
    weights of a pipelined stack live only on their own stage (the PP
    memory win) while non-pipelined stacks stay replicated."""
    import jax.tree_util as jtu

    def spec_for(path, leaf) -> P:
        keys = tuple(str(getattr(k, "key", k)) for k in path)
        nd = getattr(leaf, "ndim", 0)
        # anchored to the ENCODER stacks that active() actually routes:
        # the stacked leaves live at .../encoder/layers/... (transformer.
        # init_encoder; bare stacks start at "layers").  Decoder stacks
        # are also stored under "layers" but run the sequential/KV-cached
        # paths and never pipeline; a future param group that merely
        # contains 'layers' somewhere in its path must not silently
        # change placement (ADVICE r3).
        i = keys.index("layers") if "layers" in keys else -1
        anchored = i == 0 or (i > 0 and keys[i - 1] == "encoder")
        if (anchored and "decoder" not in keys and nd >= 1
                and n_stage > 1 and leaf.shape[0] >= n_stage
                and leaf.shape[0] % n_stage == 0):
            return P(STAGE_AXIS, *([None] * (nd - 1)))
        return P()

    return jtu.tree_map_with_path(spec_for, params)


def driver_mesh(opts, global_batch: int) -> Mesh:
    """Driver-facing mesh builder: with ``--pp_stages > 1`` split the
    devices into a (data, stage) DP×PP mesh and enable the pipeline
    toggle (``--pp_microbatches`` microbatches); otherwise the plain
    data-parallel divisor mesh."""
    from hero_tpu.parallel.mesh import divisor_mesh
    s = int(getattr(opts, "pp_stages", 1) or 1)
    if s <= 1:
        return divisor_mesh(global_batch)
    assert not getattr(opts, "zero1", False), (
        "--zero1 composes with the 1-D data mesh, not DP×PP")
    n_dev = len(jax.devices())
    assert n_dev % s == 0, (n_dev, s)
    n_data = n_dev // s
    assert global_batch % n_data == 0, (global_batch, n_data)
    m = int(getattr(opts, "pp_microbatches", 2) or 2)
    assert (global_batch // n_data) % m == 0, (global_batch, n_data, m)
    mesh = get_pp_mesh(n_data, s)
    enable_pipeline(mesh, n_microbatches=m)
    return mesh


def pipelined_encoder(layers_p: Any, keys: jax.Array, use_rng: bool,
                      x: jax.Array, mask: Optional[jax.Array], cfg,
                      *, train: bool = False, dtype=jnp.float32,
                      remat: bool = False) -> jax.Array:
    """Run the stacked encoder layers as a GPipe pipeline over the active
    (data, stage) mesh.  Numerically identical to the sequential scan when
    dropout is off (same layer order, ppermute/psum add no arithmetic)."""
    from hero_tpu.models.transformer import encoder_layer

    mesh = _PIPELINE_MESH
    assert mesh is not None
    S = int(mesh.shape[STAGE_AXIS])
    has_mask = mask is not None
    if not has_mask:  # dummy leaf so specs/args line up; never read
        mask = jnp.zeros((x.shape[0], 0), x.dtype)

    def stage_fn(lp, lkeys, xb, maskb):
        B = xb.shape[0]
        # per-call-site microbatch count: the largest divisor of the
        # local batch ≤ the requested count (encoders see many batch
        # shapes — query pools, flattened sub rows — besides the train
        # batch; degrade to fewer/one microbatch rather than fail)
        M = _N_MICRO
        while B % M:
            M -= 1
        mbs = xb.reshape(M, B // M, *xb.shape[1:])
        mask_mbs = maskb.reshape(M, B // M, *maskb.shape[1:])
        s = jax.lax.axis_index(STAGE_AXIS)

        def run_block(h, m, mb_idx):
            def body(carry, xs):
                layer, key = xs
                r = (jax.random.fold_in(key, mb_idx) if use_rng else None)
                carry = encoder_layer(layer, carry, m, cfg, rng=r,
                                      train=train, dtype=dtype)
                return carry, None
            if remat and train:
                body = jax.checkpoint(
                    body, prevent_cse=False,
                    policy=jax.checkpoint_policies
                    .dots_with_no_batch_dims_saveable)
            h, _ = jax.lax.scan(body, h, (lp, lkeys))
            return h

        def tick(carry, t):
            recv, out = carry
            mb_idx = jnp.clip(t - s, 0, M - 1)
            feed = jax.lax.dynamic_index_in_dim(
                mbs, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            h_in = jnp.where(s == 0, feed, recv)
            m_in = (jax.lax.dynamic_index_in_dim(mask_mbs, mb_idx, 0,
                                                 keepdims=False)
                    if has_mask else None)
            h = run_block(h_in, m_in, mb_idx)
            # last stage commits its finished microbatch; other stages
            # (and bubble ticks) leave the zero buffer untouched
            live = (t - s >= 0) & (t - s < M) & (s == S - 1)
            cur = jax.lax.dynamic_index_in_dim(out, mb_idx, 0,
                                               keepdims=False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(live, h, cur), mb_idx, 0)
            send = jax.lax.ppermute(
                h, STAGE_AXIS, [(i, (i + 1) % S) for i in range(S)])
            return (send, out), None

        (_, out), _ = jax.lax.scan(
            tick, (jnp.zeros_like(mbs[0]), jnp.zeros_like(mbs)),
            jnp.arange(M + S - 1))
        out = jax.lax.psum(out, STAGE_AXIS)  # zeros off the last stage
        return out.reshape(B, *xb.shape[1:])

    # check_vma=False: VMA/replication checking is off, so gradient
    # correctness for the data-replicated layer params rests on the
    # conservative transpose psum — pinned against plain DP by
    # tests/test_pipeline_parallel.py::test_pipeline_parallel_train_step
    # (quick-core); if a JAX upgrade changes shard_map transpose
    # semantics, that test is the guard that catches it (ADVICE r3)
    fn = jax.shard_map(
        stage_fn, mesh=mesh,
        in_specs=(P(STAGE_AXIS), P(STAGE_AXIS), P(DATA_AXIS),
                  P(DATA_AXIS)),
        out_specs=P(DATA_AXIS), check_vma=False)
    return fn(layers_p, keys, x, mask)
