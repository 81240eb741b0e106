"""Worker for the 2-process distributed TRAIN test.

Run as ``python tests/mp_train_worker.py <rank> <nproc> <port> <out.json>``:
initializes ``jax.distributed`` over gloo on CPU (1 local device per
process → a 2-device global mesh), runs a few VSM train steps through the
same ``make_sharded_train_step`` + ``shard_task_batch`` path the drivers
use, and writes per-step losses + a param checksum to ``out.json``.

This is the multi-host TRAIN analog of ``mp_eval_worker.py``: every
process assembles the IDENTICAL global batch (common-seed design, like
the drivers' un-sharded train loaders) and ``jax.device_put`` with the
global ``P('data')`` sharding slices out each process's addressable
shard; XLA inserts the cross-process gradient reduction (the reference's
Horovod allreduce, ``pretrain.py:314-321``).
"""

import json
import sys


def run_train(n_steps: int = 3):
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hero_tpu.config.model_config import tiny_hero_config
    from hero_tpu.data import synthetic
    from hero_tpu.models import pretrain
    from hero_tpu.parallel.mesh import get_mesh, shard_task_batch
    from hero_tpu.training.step import (TrainSpec, TrainState,
                                        make_sharded_train_step,
                                        shard_state)

    cfg = tiny_hero_config()
    vsm = pretrain.VsmConfig(lw_neg_ctx=1.0, lw_neg_q=1.0, lw_st_ed=0.01)
    params = pretrain.init_hero_for_pretraining(jax.random.PRNGKey(0), cfg)

    def loss_fn(p, b, rng):
        a, x, y = pretrain.forward_vsm(p, cfg, vsm, b, rng=rng, train=True)
        return a + x + y, {}

    mesh = get_mesh()
    assert mesh.devices.size == 2, mesh.devices
    spec = TrainSpec(learning_rate=1e-3, warmup_steps=1,
                     num_train_steps=100, grad_norm=1.0)
    step = make_sharded_train_step(loss_fn, spec, mesh, donate=False)
    state = shard_state(TrainState.create(params), mesh)

    shape = dataclasses.replace(synthetic.TINY, batch=4)
    losses = []
    for i in range(n_steps):
        batch = synthetic.vsm_batch(shape, seed=i)       # identical on
        sharded = shard_task_batch(batch, mesh)          # every process
        state, metrics = step(state, sharded, jax.random.PRNGKey(7 + i))
        losses.append(float(jax.device_get(metrics["loss"])))

    # params are fully replicated → host fetch is legal in every process
    leaves = jax.tree.leaves(state.params)
    checksum = float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                         for l in leaves))
    init_checksum = float(sum(np.abs(np.asarray(l, np.float32)).sum()
                              for l in jax.tree.leaves(params)))
    return losses, checksum, init_checksum


def main():
    rank, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                                   num_processes=nproc, process_id=rank,
                                   initialization_timeout=300)
    else:
        # single-process baseline: same 2-device global mesh, virtualized
        pass
    sys.path.insert(0, ".")
    losses, checksum, init_checksum = run_train()
    with open(out, "w") as f:
        json.dump({"rank": rank, "losses": losses, "checksum": checksum,
                   "init_checksum": init_checksum}, f)


if __name__ == "__main__":
    main()
