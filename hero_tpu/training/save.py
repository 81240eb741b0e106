"""Checkpointing: publishable params + train-state restore.

Mirrors the reference's two mechanisms (``utils/save.py``):

1. :class:`ModelSaver` — host-side param snapshots ``ckpt/model_step_N.npz``
   (reference ``ModelSaver.save`` writes cpu state_dicts, :112-133).
2. :class:`TrainingRestorer` — ``restore.npz`` + one backup, auto-resume
   with an hps-unchanged assertion and the restored ``global_step``
   (reference :136-181).

Arrays are stored as a flat ``{"a/b/c": array}`` npz — dependency-light,
fast, and trivially diffable against the torch→JAX converter output.
``save_training_meta`` reproduces the provenance artifacts (hps.json,
model_config.json, git info; reference :21-73).

Beyond the reference: checkpoint FILE I/O is asynchronous and atomic.
The device→host fetch stays on the caller (main) thread — background
threads must never touch the device through the tunneled runtime
(CLAUDE.md) — but the multi-hundred-MB ``np.savez`` moves to a single
writer thread so training never blocks on disk, every write goes
tmp-then-rename so a crash mid-write cannot truncate ``restore.npz``,
and :meth:`TrainingRestorer.restore` falls back to the backup when the
primary file is unreadable.
"""

from __future__ import annotations

import json
import os
import queue
import subprocess
import threading
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

from hero_tpu.utils.logger import LOGGER


def _atomic_savez(path: str, flat: Dict[str, np.ndarray]) -> None:
    """Write ``flat`` to ``path`` via tmp-file + rename (crash-safe)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class AsyncCheckpointWriter:
    """One background writer thread for checkpoint file I/O.

    ``submit(job)`` enqueues a no-arg callable; at most one job is
    pending (a second submit blocks until the previous write finished —
    natural backpressure, and writes stay ordered).  Exceptions from a
    job are re-raised on the next ``submit``/``flush`` so a failing disk
    crashes training loudly instead of silently dropping checkpoints.
    Jobs receive only HOST data; the caller must have fetched device
    arrays already.
    """

    def __init__(self):
        self._q: "queue.Queue[Optional[Callable[[], None]]]" = \
            queue.Queue(maxsize=1)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="ckpt-writer")
        self._started = False

    def _run(self):
        while True:
            job = self._q.get()
            if job is None:
                return
            try:
                job()
            except BaseException as e:   # noqa: BLE001 — re-raised on main
                self._err = e
            finally:
                self._q.task_done()

    def _check(self):
        if self._err is not None:
            err, self._err = self._err, None
            raise RuntimeError("checkpoint write failed") from err

    def submit(self, job: Callable[[], None]) -> None:
        if not self._started:
            self._thread.start()
            self._started = True
        # wait for the previous write to FINISH before enqueueing: each
        # job closure pins a full host snapshot of the train state, so
        # "one running + one queued" would double peak host RAM at
        # flagship size; join-first keeps at most one snapshot inside the
        # writer, and surfaces the previous job's error at this submit
        # rather than an interval later
        self._q.join()
        self._check()
        self._q.put(job)

    def flush(self) -> None:
        """Wait for all pending writes; re-raise any writer error."""
        if self._started:
            self._q.join()
        self._check()

    def close(self) -> None:
        self.flush()
        if self._started:
            self._q.put(None)
            self._thread.join()
            self._started = False


def flatten_tree(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
        return out
    out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Any:
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def save_params(path: str, params) -> None:
    host = jax.tree.map(np.asarray, params)
    np.savez(path, **flatten_tree(host))


def load_params(path: str) -> Any:
    with np.load(path) as z:
        return unflatten_tree({k: z[k] for k in z.files
                               if not k.startswith("__")})


def checkpoint_vocab_padded(path: str) -> Optional[bool]:
    """Read the ``vocab_padded`` marker from a ModelSaver checkpoint;
    None if the checkpoint predates the marker."""
    with np.load(path) as z:
        if "__vocab_padded__" in z.files:
            return bool(z["__vocab_padded__"])
    return None


class ModelSaver:
    """``vocab_padded`` is the ACTUAL pad decision threaded from checkpoint
    conversion/init (reference ModelSaver records whether padding was
    applied, utils/save.py:119-127) — inferring it from ``rows % 8 == 0``
    would mislabel a naturally mult-of-8 vocab as padded and tell consumers
    to strip real embedding rows.  ``None`` = unknown (marker omitted)."""

    def __init__(self, output_dir: str, prefix: str = "model_step",
                 suffix: str = "npz",
                 vocab_padded: Optional[bool] = None,
                 writer: Optional[AsyncCheckpointWriter] = None):
        self.output_dir = output_dir
        self.prefix = prefix
        self.suffix = suffix
        self.vocab_padded = vocab_padded
        self.writer = writer
        os.makedirs(output_dir, exist_ok=True)

    def save(self, params, step: int) -> str:
        path = os.path.join(self.output_dir,
                            f"{self.prefix}_{step}.{self.suffix}")
        host = jax.tree.map(np.asarray, params)   # device fetch: caller
        flat = flatten_tree(host)                 # thread (tunnel-safe)
        if self.vocab_padded is not None:
            flat["__vocab_padded__"] = np.asarray(self.vocab_padded)
        if self.writer is not None:
            self.writer.submit(lambda: _atomic_savez(path, flat))
        else:
            _atomic_savez(path, flat)
        return path

    def flush(self) -> None:
        if self.writer is not None:
            self.writer.flush()


def save_training_meta(output_dir: str, hps: Dict[str, Any],
                       model_config: Dict[str, Any]) -> None:
    """hps.json + model_config.json + git provenance
    (reference utils/save.py:21-73).  The eval drivers reload hps.json as
    the serve config — keep the schema stable."""
    os.makedirs(os.path.join(output_dir, "log"), exist_ok=True)
    os.makedirs(os.path.join(output_dir, "ckpt"), exist_ok=True)
    with open(os.path.join(output_dir, "log", "hps.json"), "w") as f:
        json.dump(hps, f, indent=4)
    with open(os.path.join(output_dir, "log", "model_config.json"),
              "w") as f:
        json.dump(model_config, f, indent=4)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        sha = subprocess.check_output(
            ["git", "rev-parse", "HEAD"], stderr=subprocess.DEVNULL,
            cwd=pkg_root).decode().strip()
        with open(os.path.join(output_dir, "log", "git_info.json"),
                  "w") as f:
            json.dump({"git_sha": sha}, f)
    except Exception:
        # git unavailable → zip the codebase instead (reference
        # save_training_meta fallback, utils/save.py:51-66)
        try:
            from hero_tpu.utils.basic_utils import make_zipfile
            make_zipfile(pkg_root,
                         os.path.join(output_dir, "log", "code.zip"))
        except Exception:
            pass


class TrainingRestorer:
    """Preemption-safe resume (reference utils/save.py:136-181)."""

    def __init__(self, output_dir: str, hps: Dict[str, Any],
                 writer: Optional[AsyncCheckpointWriter] = None):
        self.save_path = os.path.join(output_dir, "restore.npz")
        self.backup_path = os.path.join(output_dir, "restore_backup.npz")
        self.hps_path = os.path.join(output_dir, "restore_hps.json")
        self.writer = writer
        os.makedirs(output_dir, exist_ok=True)
        # Multi-host: every process constructs a restorer over the SAME
        # shared output_dir, so the hps sentinel must be written by the
        # primary only, atomically (tmp+rename) — a non-primary reading a
        # partially-written file would crash the resume guard.  A
        # non-primary that races ahead of the primary's first write just
        # skips the (advisory) guard; the primary still enforces it.
        from hero_tpu.parallel.mesh import is_primary
        if os.path.exists(self.hps_path):
            try:
                with open(self.hps_path) as f:
                    restore_hps = json.load(f)
            except ValueError:
                if is_primary():
                    raise        # primary wrote it atomically: real corruption
                restore_hps = None   # non-primary raced a stale reader: skip
            if restore_hps is not None:
                assert restore_hps == hps, (
                    "hps changed between runs; refusing to resume")
        elif is_primary():
            tmp = self.hps_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(hps, f, indent=4)
            os.replace(tmp, self.hps_path)
        self.global_step = 0

    def can_restore(self) -> bool:
        return (os.path.exists(self.save_path)
                or os.path.exists(self.backup_path))

    def step(self, train_state, save_steps: int,
             global_step: Optional[int] = None) -> None:
        """Call every training step.  Pass the driver's host-side
        ``global_step`` int — fetching ``train_state.global_step`` from
        device would force a blocking tunnel round-trip each step
        (CLAUDE.md: only value fetches synchronize)."""
        step = (int(train_state.global_step) if global_step is None
                else global_step)
        self.global_step = step
        if step % save_steps == 0:
            self.save(train_state, global_step=step)

    def save(self, train_state, global_step: Optional[int] = None) -> None:
        flat = flatten_tree(jax.tree.map(np.asarray, {   # device fetch:
            "params": train_state.params,                # caller thread
            "mu": train_state.opt.mu,
            "nu": train_state.opt.nu,
        }))
        flat["__step__"] = np.asarray(
            int(train_state.global_step) if global_step is None
            else global_step)

        def job():
            # backup dance + atomic write together in the (single) writer
            # so ordering holds and a crash at any point leaves at least
            # one complete file: the tmp-rename means save_path is never
            # truncated, and the previous save survives as the backup.
            if os.path.exists(self.save_path):
                os.replace(self.save_path, self.backup_path)
            _atomic_savez(self.save_path, flat)

        if self.writer is not None:
            self.writer.submit(job)
        else:
            job()

    def flush(self) -> None:
        if self.writer is not None:
            self.writer.flush()

    def restore(self, train_state):
        """Load into a template TrainState; returns the restored state.
        Falls back to the backup when the primary file is unreadable
        (e.g. a pre-atomic-write checkpoint truncated by a crash)."""
        from hero_tpu.training.optim import AdamWState
        from hero_tpu.training.step import TrainState
        candidates = [p for p in (self.save_path, self.backup_path)
                      if os.path.exists(p)]
        step = tree = path = None
        for path in candidates:
            try:
                with np.load(path) as z:
                    step = int(z["__step__"])
                    tree = unflatten_tree(
                        {k: z[k] for k in z.files if k != "__step__"})
                break
            except Exception as e:   # corrupt/truncated → try backup
                LOGGER.warning("unreadable checkpoint %s (%r); falling "
                               "back", path, e)
                step = tree = None
        if tree is None:
            raise RuntimeError(
                f"no readable restore checkpoint among {candidates}")
        LOGGER.info("restored training state at step %d from %s", step,
                    path)
        self.global_step = step
        import jax.numpy as jnp
        return TrainState(
            params=tree["params"],
            opt=AdamWState(step=jnp.asarray(step, jnp.int32),
                           mu=tree["mu"], nu=tree["nu"]),
            global_step=jnp.asarray(step, jnp.int32))
