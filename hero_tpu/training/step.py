"""Train-step builder: one jit'd global step over the device mesh.

TPU-native replacement for the reference driver loop body
(``pretrain.py:274-348``): instead of per-GPU processes with explicit
allreduce, the whole step — forward, backward, gradient accumulation, LR
schedule, clip, AdamW — is one compiled function over globally-sharded
batches.  Params/optimizer state are replicated, batches are sharded on the
``data`` mesh axis, and XLA inserts the gradient reduction (and the VSM
negative all-gather) over ICI.

Gradient accumulation takes a batch with a leading ``(accum, ...)``
micro-batch axis and ``lax.scan``s the forward/backward, summing grads —
the analog of the reference's delayed-unscale accumulation
(``pretrain.py:309-323``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hero_tpu.training import optim as optim_lib
from hero_tpu.training.optim import AdamWConfig, AdamWState


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt: AdamWState
    global_step: jax.Array          # optimizer steps taken

    @classmethod
    def create(cls, params) -> "TrainState":
        return cls(params=params, opt=optim_lib.adamw_init(params),
                   global_step=jnp.zeros((), jnp.int32))


@dataclasses.dataclass(frozen=True)
class TrainSpec:
    """Static training hyper-params (reference opts subset)."""
    learning_rate: float = 3e-5
    warmup_steps: int = 1000
    num_train_steps: int = 100000
    grad_norm: float = 2.0          # -1 disables clipping
    adamw: AdamWConfig = AdamWConfig()
    lr_schedule: str = "warmup_linear"   # | "noam" | "vqa"


def _build_step(loss_fn: Callable, spec: TrainSpec, accum_steps: int,
                constrain_state: Optional[Callable] = None):

    def grads_of(params, batch, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng)
        return loss, aux, grads

    def step(state: TrainState, batch, rng):
        if accum_steps > 1:
            def body(carry, xs):
                acc_grads, acc_loss = carry
                micro, sub_rng = xs
                loss, aux, grads = grads_of(state.params, micro, sub_rng)
                acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
                return (acc_grads, acc_loss + loss), aux

            rngs = jax.random.split(rng, accum_steps)
            zero = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            (grads, loss_sum), aux = jax.lax.scan(
                body, (zero, jnp.zeros((), jnp.float32)), (batch, rngs))
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            loss = loss_sum / accum_steps
            aux = jax.tree.map(lambda a: jnp.mean(a, axis=0), aux)
        else:
            loss, aux, grads = grads_of(state.params, batch, rng)

        new_step = state.global_step + 1
        lr = optim_lib.get_lr(new_step, spec.learning_rate,
                              spec.warmup_steps, spec.num_train_steps,
                              schedule=spec.lr_schedule)
        if spec.grad_norm > 0:
            grads, gnorm = optim_lib.clip_by_global_norm(grads,
                                                         spec.grad_norm)
        else:
            gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                                 for g in jax.tree.leaves(grads)))
        new_params, new_opt = optim_lib.adamw_update(
            grads, state.opt, state.params, lr, spec.adamw)
        metrics = {"loss": loss, "lr": lr, "grad_norm": gnorm, **aux}
        new_state = TrainState(params=new_params, opt=new_opt,
                               global_step=new_step)
        if constrain_state is not None:
            new_state = constrain_state(new_state)
        return new_state, metrics

    return step


def make_train_step(loss_fn: Callable, spec: TrainSpec,
                    *, accum_steps: int = 1, donate: bool = True):
    """Build the jit'd step.

    ``loss_fn(params, batch, rng) -> (loss, aux_dict)`` — per-microbatch
    scalar loss (already mean-reduced over the global batch).

    Returns ``step(state, batch, rng) -> (state, metrics)`` where ``batch``
    has a leading accum axis iff ``accum_steps > 1``.
    """
    step = _build_step(loss_fn, spec, accum_steps)
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _zero1_shardings(params, mesh: Mesh):
    """(replicated, per-moment-leaf) NamedShardings for ZeRO-1."""
    from hero_tpu.parallel.mesh import DATA_AXIS, zero1_opt_spec
    rep = NamedSharding(mesh, P())
    spec = zero1_opt_spec(params, mesh.shape[DATA_AXIS])
    moments = jax.tree.map(lambda s: NamedSharding(mesh, s), spec,
                           is_leaf=lambda x: isinstance(x, P))
    return rep, moments


def shard_state(state: TrainState, mesh: Mesh,
                zero1: bool = False) -> TrainState:
    """Replicate train state over the mesh; if the mesh carries a 'model'
    axis, tensor-parallel-shard the transformer weights (and their AdamW
    moments) per :func:`hero_tpu.parallel.mesh.tp_param_spec`.  With
    ``zero1=True`` (1-D data mesh only), shard the AdamW moments over the
    data axis instead of replicating them — ZeRO-1 optimizer-state
    sharding (see :func:`hero_tpu.parallel.mesh.zero1_opt_spec`)."""
    if zero1 and mesh.devices.size > 1:
        assert "model" not in mesh.axis_names \
            and "stage" not in mesh.axis_names, (
            "zero1 composes with the 1-D data mesh, not DP×TP/DP×PP")
        rep, moments = _zero1_shardings(state.params, mesh)
        put = lambda tree: jax.tree.map(jax.device_put, tree, moments)
        return TrainState(
            params=jax.device_put(state.params, rep),
            opt=type(state.opt)(
                step=jax.device_put(state.opt.step, rep),
                mu=put(state.opt.mu), nu=put(state.opt.nu)),
            global_step=jax.device_put(state.global_step, rep))
    if mesh.devices.size == 1:
        # single-device mesh: the arrays already live on (or will be
        # transferred to) the only device; per-leaf sharded device_put
        # costs a tunnel round-trip PER LEAF (~300 leaves ≈ minutes on
        # the tunneled runtime) for a no-op placement.
        return state
    if "model" in mesh.axis_names or "stage" in mesh.axis_names:
        if "stage" in mesh.axis_names:
            from hero_tpu.parallel.pipeline import (STAGE_AXIS,
                                                    pp_param_spec)
            spec = pp_param_spec(state.params, mesh.shape[STAGE_AXIS])
        else:
            from hero_tpu.parallel.mesh import tp_param_spec
            spec = tp_param_spec(state.params)
        put = lambda tree: jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, spec)
        return TrainState(
            params=put(state.params),
            opt=type(state.opt)(
                step=jax.device_put(state.opt.step,
                                    NamedSharding(mesh, P())),
                mu=put(state.opt.mu), nu=put(state.opt.nu)),
            global_step=jax.device_put(state.global_step,
                                       NamedSharding(mesh, P())))
    rep = NamedSharding(mesh, P())
    return jax.device_put(state, rep)


def make_sharded_train_step(loss_fn: Callable, spec: TrainSpec, mesh: Mesh,
                            *, accum_steps: int = 1, donate: bool = True,
                            zero1: bool = False):
    """As :func:`make_train_step` but with explicit sharding constraints:
    replicated state, batch sharded on the data axis (dim 0 of every array,
    after the accum axis if present).  ``zero1=True`` keeps the params
    replicated but pins the AdamW moments to the data-axis sharding of
    :func:`shard_state(..., zero1=True) <shard_state>` — XLA then runs the
    optimizer update 1/N per chip and all-gathers the param delta."""
    dn = (0,) if donate else ()
    if zero1 and mesh.devices.size > 1:
        assert "model" not in mesh.axis_names
        assert "stage" not in mesh.axis_names

        def constrain(state: TrainState) -> TrainState:
            rep, moments = _zero1_shardings(state.params, mesh)
            csc = jax.lax.with_sharding_constraint
            con = lambda tree: jax.tree.map(csc, tree, moments)
            return TrainState(
                params=jax.tree.map(lambda x: csc(x, rep), state.params),
                opt=type(state.opt)(step=state.opt.step,
                                    mu=con(state.opt.mu),
                                    nu=con(state.opt.nu)),
                global_step=state.global_step)

        step = _build_step(loss_fn, spec, accum_steps,
                           constrain_state=constrain)
        # out shardings are pinned by the in-step constraints
        return jax.jit(step, donate_argnums=dn)
    rep = NamedSharding(mesh, P())
    step = _build_step(loss_fn, spec, accum_steps)
    # batch sharding is taken from the inputs (see mesh.shard_task_batch:
    # per-key data/replicated placement); state keeps its input sharding
    # (replicated, or TP-sharded via shard_state on a 2-D mesh)
    if "model" in mesh.axis_names or "stage" in mesh.axis_names:
        # state keeps its input (TP / pipeline-stage) shardings
        return jax.jit(step, out_shardings=(None, rep), donate_argnums=dn)
    return jax.jit(step, out_shardings=(rep, rep), donate_argnums=dn)
