"""Worker for the 2-process multi-host RESUME drill.

Run as ``python tests/mp_resume_worker.py <rank> <nproc> <port> <mode>
<root> <out.json>``: initializes ``jax.distributed`` over gloo on CPU
(1 local device per process) and runs the REAL pretrain driver
(``drivers.pretrain.main`` — TrainingRestorer, ModelSaver, MetaLoader
fast_forward, the whole resume surface) against a corpus + config the
parent test prepared under ``root``.

Modes:
- ``full``  — uninterrupted run (config ``root/full.json``)
- ``trunc`` — same config as ``resume`` but preempted: num_train_steps
  is forced to 3 mid-flight, so restore.npz is written and the run ends
  early on BOTH processes (the deterministic stand-in for killing both
  mid-run — a SIGTERM race between ranks would deadlock the lockstep
  collectives, which is why real pods also preempt at a step boundary)
- ``resume`` — rerun of the ``resumed`` config; must restore from
  rank 0's restore.npz on BOTH ranks and replay the exact schedule

``log_every`` is forced to 1 so rank 0's ``log/scalars.jsonl`` records
the per-step loss and task schedule for the parent to diff.
"""

import json
import os
import sys


def main():
    rank, nproc, port, mode, root, out = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
        sys.argv[5], sys.argv[6])
    import jax
    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        # drivers call hero_tpu.parallel.mesh.init_distributed(), which
        # picks this triplet up (the production multi-host entry path)
        os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        os.environ["JAX_NUM_PROCESSES"] = str(nproc)
        os.environ["JAX_PROCESS_ID"] = str(rank)
    sys.path.insert(0, ".")

    from hero_tpu.config import opts as opts_lib
    import hero_tpu.drivers.common as dcommon
    from hero_tpu.drivers import pretrain as drv

    cfg_path = os.path.join(
        root, "full.json" if mode == "full" else "resumed.json")
    orig = dcommon.run_training

    def wrapped(opts, *a, **k):
        if mode == "trunc":
            opts.num_train_steps = 3
        k["log_every"] = 1
        return orig(opts, *a, **k)

    dcommon.run_training = wrapped
    try:
        drv.main(opts_lib.get_pretrain_args(["--config", cfg_path]))
    finally:
        dcommon.run_training = orig

    with open(out, "w") as f:
        json.dump({"rank": rank, "mode": mode,
                   "nproc": jax.process_count(), "ok": True}, f)


if __name__ == "__main__":
    main()
