"""AdamW with HERO's 4-group policy, plus LR schedules.

Reference semantics (``optim/adamw.py:14-106``, ``optim/misc.py:14-50``,
``optim/sched.py``):

- HF-style decoupled AdamW, eps inside sqrt-denominator add, bias
  correction on, weight decay applied as ``-lr * wd * p`` with the group's
  *current* lr;
- 4 param groups: (top vs backbone) × (decay vs no-decay), where "top" is
  every param outside ``v_encoder`` (task heads) and gets ``lr_mul × lr``
  in the finetune drivers (``train_tvc.py:193-197``); "no-decay" is every
  bias plus LayerNorm scales;
- ``warmup_linear`` schedule with a 1e-8 floor (``sched.py:43-49``).

Implemented as a single pytree-wide transform with per-leaf lr-scale and
weight-decay masks — no param-group bookkeeping, works under jit/pjit, and
the schedule is computed *inside* the step from the step counter (traced),
so LR changes never recompile.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Any


# ---------------------------------------------------------------------------
# schedules (pure, traced-friendly)
# ---------------------------------------------------------------------------

def warmup_linear(step, warmup_step: int, tot_step: int):
    """BERT schedule (reference sched.py:20-24)."""
    step = jnp.asarray(step, jnp.float32)
    warm = step / max(warmup_step, 1)
    decay = jnp.maximum(0.0, (tot_step - step) / max(tot_step - warmup_step,
                                                     1))
    return jnp.where(step < warmup_step, warm, decay)


def noam_schedule(step, warmup_step: int = 4000):
    step = jnp.asarray(step, jnp.float32)
    return jnp.where(step <= warmup_step, step / warmup_step,
                     (warmup_step ** 0.5) * jnp.maximum(step, 1.0) ** -0.5)


def get_lr(step, learning_rate: float, warmup_steps: int,
           num_train_steps: int, schedule: str = "warmup_linear"):
    """reference get_lr_sched (sched.py:43-49) incl. the 1e-8 floor;
    schedule ∈ {warmup_linear, noam, vqa}."""
    if schedule == "noam":
        mult = noam_schedule(step, warmup_steps)
    elif schedule == "vqa":
        mult = vqa_schedule(step, warmup_steps, warmup_steps,
                            num_train_steps // 2, 0.5)
    else:
        mult = warmup_linear(step, warmup_steps, num_train_steps)
    return jnp.maximum(learning_rate * mult, 1e-8)


# ---------------------------------------------------------------------------
# masks
# ---------------------------------------------------------------------------

def _tree_paths_map(fn: Callable[[Tuple[str, ...]], Any], tree):
    """Map fn over leaf paths (dict-key tuples)."""
    paths_leaves = jax.tree_util.tree_flatten_with_path(tree)
    leaves = [fn(tuple(str(getattr(k, "key", k)) for k in path))
              for path, _ in paths_leaves[0]]
    return jax.tree_util.tree_unflatten(paths_leaves[1], leaves)


def no_decay_mask(params) -> Any:
    """1.0 where weight decay applies, 0.0 for biases and LN params."""
    def f(path):
        if path[-1] == "bias":
            return 0.0
        if len(path) >= 2 and path[-2].endswith("ln"):
            return 0.0
        return 1.0
    return _tree_paths_map(f, params)


def top_lr_mask(params) -> Any:
    """1.0 for params outside v_encoder (the heads), else 0.0."""
    return _tree_paths_map(lambda p: 0.0 if p[0] == "v_encoder" else 1.0,
                           params)


# ---------------------------------------------------------------------------
# AdamW
# ---------------------------------------------------------------------------

class AdamWState(NamedTuple):
    step: jax.Array
    mu: Params
    nu: Params


class AdamWConfig(NamedTuple):
    beta1: float = 0.9
    beta2: float = 0.98
    eps: float = 1e-6
    weight_decay: float = 0.01
    correct_bias: bool = True
    lr_mul: float = 1.0


def adamw_init(params) -> AdamWState:
    z = jax.tree.map(jnp.zeros_like, params)
    return AdamWState(step=jnp.zeros((), jnp.int32), mu=z,
                      nu=jax.tree.map(jnp.zeros_like, params))


def adamw_update(grads, state: AdamWState, params, lr,
                 cfg: AdamWConfig, *, decay_mask=None, top_mask=None
                 ) -> Tuple[Params, AdamWState]:
    """One AdamW step.  ``lr`` may be a traced scalar (schedule inside
    jit).  Returns (new_params, new_state)."""
    if decay_mask is None:
        decay_mask = no_decay_mask(params)
    if top_mask is None:
        top_mask = top_lr_mask(params)
    step = state.step + 1
    b1, b2 = cfg.beta1, cfg.beta2
    if cfg.correct_bias:
        sf = jnp.sqrt(1.0 - b2 ** step.astype(jnp.float32)) / (
            1.0 - b1 ** step.astype(jnp.float32))
    else:
        sf = 1.0

    def upd(g, m, v, p, dm, tm):
        g = g.astype(jnp.float32)
        p32 = p.astype(jnp.float32)
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * g * g
        leaf_lr = lr * (1.0 + (cfg.lr_mul - 1.0) * tm)
        p_new = p32 - leaf_lr * sf * m / (jnp.sqrt(v) + cfg.eps)
        # reference adamw.py:104 decays the *already-updated* value
        # (p.add_(-lr*wd*p) after addcdiv_), not the pre-step one
        p_new = p_new - leaf_lr * cfg.weight_decay * dm * p_new
        return p_new.astype(p.dtype), m, v

    flat = jax.tree.map(upd, grads, state.mu, state.nu, params, decay_mask,
                        top_mask)
    new_params = jax.tree.map(lambda t: t[0], flat,
                              is_leaf=lambda x: isinstance(x, tuple))
    new_mu = jax.tree.map(lambda t: t[1], flat,
                          is_leaf=lambda x: isinstance(x, tuple))
    new_nu = jax.tree.map(lambda t: t[2], flat,
                          is_leaf=lambda x: isinstance(x, tuple))
    return new_params, AdamWState(step=step, mu=new_mu, nu=new_nu)


def clip_by_global_norm(grads, max_norm: float):
    """torch.nn.utils.clip_grad_norm_ semantics; returns (grads, norm).

    NOTE: batching the ~100 small-leaf (bias/LN) square-sums into one
    concatenated reduction was measured perf-neutral on v5e (322.0 vs
    322.15 ex/s at the bench shape) — XLA already fuses the small
    reductions into neighboring fusions — so the simple per-leaf form
    stays."""
    leaves = jax.tree.leaves(grads)
    norm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                        for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda g: (g * scale).astype(g.dtype), grads), norm


def vqa_schedule(step, warmup_interval: int, decay_interval: int,
                 decay_start: int, decay_rate: float):
    """MCAN-style VQA step schedule (reference sched.py:27-40)."""
    step = jnp.asarray(step, jnp.float32)
    num_decay = jnp.ceil((step - decay_start) / decay_interval)
    return jnp.where(
        step < warmup_interval, 0.25,
        jnp.where(step < 2 * warmup_interval, 0.5,
                  jnp.where(step < 3 * warmup_interval, 0.75,
                            jnp.where(step >= decay_start,
                                      decay_rate ** num_decay, 1.0))))
