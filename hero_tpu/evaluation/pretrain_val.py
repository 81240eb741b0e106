"""Per-task pretraining validators (reference ``pretrain.py:387-608``):
VSM losses, MLM accuracy, MFM-NCE accuracy, MFFR feature error, FOM
accuracy — plus the reference's ex/tok/feat-per-second throughput logging.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from hero_tpu.config.model_config import HeroConfig
from hero_tpu.models import model as backbone
from hero_tpu.models import pretrain as pretrain_lib
from hero_tpu.models.pretrain import VsmConfig
from hero_tpu.utils.logger import LOGGER
from hero_tpu.utils.misc import params_to_device


def _device_batch(batch: Dict[str, Any]) -> Dict[str, jax.Array]:
    """Validation batch → device arrays the jitted forward can consume.

    Single-process: plain ``jnp.asarray``.  Multi-process: the params are
    GLOBAL (replicated over every process's devices), and jit rejects
    mixing them with process-local arrays — so the batch is device_put
    replicated over the same global mesh.  That is legal because every
    process's validation loader yields the IDENTICAL batch stream (the
    pretrain val datasets are deterministic: per-(seed,epoch,index) task
    RNG, no sampling) — the same common-data contract
    ``mp_train_worker.py`` documents for training batches.
    """
    items = {k: v for k, v in batch.items() if not k.startswith("__")}
    if jax.process_count() == 1:
        return {k: jnp.asarray(v) for k, v in items.items()}
    from jax.sharding import NamedSharding, PartitionSpec

    from hero_tpu.parallel.mesh import get_mesh, host_allgather
    # The identical-stream contract above is load-bearing: replicating a
    # process-LOCAL batch as a global array silently corrupts metrics if
    # any process drifts.  Enforce it cheaply with a host checksum
    # (shapes + fp64 content sums) compared across processes.
    import zlib
    local = np.float64(0.0)
    for k in sorted(items):
        a = np.asarray(items[k])
        local += zlib.crc32(f"{k}:{a.shape}".encode()) % (1 << 20)
        local += float(np.asarray(a, np.float64).sum())
    sums = host_allgather(float(local))
    assert all(abs(s - sums[0]) <= 1e-6 * max(1.0, abs(sums[0]))
               for s in sums), (
        "pretrain validation batch streams diverged across processes "
        f"(checksums {sums}); the common-data contract is broken")
    sh = NamedSharding(get_mesh(), PartitionSpec())
    return {k: jax.device_put(np.asarray(v), sh) for k, v in items.items()}


def validate_pretrain(params, cfg: HeroConfig, vsm: VsmConfig,
                      val_loaders: Dict[str, Iterable],
                      dtype=jnp.bfloat16,
                      mask_prob: float = 0.15) -> Dict[str, float]:
    """Run every task validator; returns a flat {task_metric: value} log."""
    out: Dict[str, float] = {}
    for task, loader in val_loaders.items():
        LOGGER.info("validate on %s task", task)
        if task.startswith("mlm"):
            log = validate_mlm(params, cfg, loader, dtype)
        elif task.startswith("mffr"):
            log = validate_mfm(params, cfg, loader, "regression", dtype,
                               mask_prob=mask_prob)
        elif task.startswith("mfm"):
            log = validate_mfm(params, cfg, loader, "nce", dtype,
                               mask_prob=mask_prob)
        elif task.startswith("fom"):
            log = validate_fom(params, cfg, loader, dtype)
        elif task.startswith("vsm"):
            log = validate_vsm(params, cfg, vsm, loader, dtype)
        else:
            raise ValueError(task)
        out.update({f"valid_{task}/{k}": v for k, v in log.items()})
    return out


def validate_vsm(params, cfg, vsm, loader, dtype=jnp.bfloat16):
    # params enter as a jit ARGUMENT: closing over them bakes hundreds of
    # MB of weight constants into the compiled program, which at flagship
    # scale exceeds the remote-compile request limit (HTTP 413)
    fwd = jax.jit(lambda p, b: pretrain_lib.forward_vsm(
        p, cfg, vsm, b, compute_loss=True, dtype=dtype))
    params = params_to_device(params)     # once, not per jit call
    t0 = time.time()
    tot = {"st_ed": 0.0, "neg_ctx": 0.0, "neg_q": 0.0}
    n_batches, n_ex = 0, 0
    for batch in loader:
        jb = _device_batch(batch)
        a, b_, c = fwd(params, jb)
        tot["st_ed"] += float(a)
        tot["neg_ctx"] += float(b_)
        tot["neg_q"] += float(c)
        n_batches += 1
        n_ex += int(np.asarray(batch["q_mask"]).sum())
    n = max(n_batches, 1)
    loss = sum(tot.values()) / n
    log = {"loss_overall": loss,
           "loss_st_ed": tot["st_ed"] / n / max(vsm.lw_st_ed, 1e-8),
           "loss_neg_ctx": tot["neg_ctx"] / n / max(vsm.lw_neg_ctx, 1e-8),
           "loss_neg_q": tot["neg_q"] / n / max(vsm.lw_neg_q, 1e-8),
           "ex_per_s": n_ex / max(time.time() - t0, 1e-6)}
    LOGGER.info("vsm val loss: %.3f", loss)
    return log


def validate_mlm(params, cfg, loader, dtype=jnp.bfloat16):
    fwd = jax.jit(lambda p, b: backbone.forward_mlm(
        p["v_encoder"], cfg, b, compute_loss=False, dtype=dtype))
    params = params_to_device(params)     # jit arg, not baked constant
    t0 = time.time()
    loss_sum, n_correct, n_word = 0.0, 0, 0
    for batch in loader:
        jb = _device_batch(batch)
        logits = np.asarray(fwd(params, jb))         # (N, M, V)
        labels = np.asarray(batch["mlm_labels"]).reshape(logits.shape[0],
                                                         -1)
        valid = labels >= 0
        pred = logits.argmax(-1)
        n_correct += int(((pred == labels) & valid).sum())
        n_word += int(valid.sum())
        safe = np.where(valid, labels, 0)
        logp = jax.nn.log_softmax(jnp.asarray(logits), -1)
        nll = -np.take_along_axis(np.asarray(logp), safe[..., None],
                                  -1)[..., 0]
        loss_sum += float((nll * valid).sum())
    dt = max(time.time() - t0, 1e-6)
    acc = n_correct / max(n_word, 1)
    LOGGER.info("mlm val acc: %.4f", acc)
    return {"loss": loss_sum / max(n_word, 1), "acc": acc,
            "tok_per_s": n_word / dt}


def validate_mfm(params, cfg, loader, loss_kind, dtype=jnp.bfloat16,
                 mask_prob: float = 0.15):
    fwd_loss = jax.jit(lambda p, b: backbone.forward_mfm(
        p["v_encoder"], cfg, b, loss=loss_kind, dtype=dtype,
        mask_prob=mask_prob))
    fwd_pred = jax.jit(lambda p, b: backbone.forward_mfm(
        p["v_encoder"], cfg, b, loss="nce", compute_loss=False,
        dtype=dtype))
    params = params_to_device(params)     # jit arg, not baked constant
    t0 = time.time()
    loss_sum, n_feat = 0.0, 0
    n_correct = 0
    for batch in loader:
        jb = _device_batch(batch)
        if loss_kind == "regression":
            s, n = fwd_loss(params, jb)
            loss_sum += float(s)
            n_feat += int(n)
        else:
            pred = np.asarray(fwd_pred(params, jb))    # (B, F, vdim)
            s, n = fwd_loss(params, jb)
            loss_sum += float(s)
            n_feat += int(n)
            # NCE "accuracy": masked prediction closest to own target.
            # Candidate pool restricted to VALID frames: zero pad rows
            # past each clip's true length score exactly 0 and would win
            # whenever all real similarities are negative, deflating acc.
            mask = np.asarray(batch["c_v_masks"]) > 0
            valid = np.asarray(batch["c_attn_masks"]).reshape(-1) > 0
            tgt = np.asarray(batch["c_v_feats"])
            p = pred[mask]
            t = tgt.reshape(-1, tgt.shape[-1])
            scores = p @ t.T
            scores[:, ~valid] = -np.inf
            own = np.flatnonzero(mask.reshape(-1))
            n_correct += int((scores.argmax(1) == own).sum())
    dt = max(time.time() - t0, 1e-6)
    log = {"loss": loss_sum / max(n_feat, 1),
           "feat_per_s": n_feat / dt}
    if loss_kind == "nce":
        log["acc"] = n_correct / max(n_feat, 1)
    LOGGER.info("%s val loss: %.4f", loss_kind, log["loss"])
    return log


def validate_fom(params, cfg, loader, dtype=jnp.bfloat16):
    fwd = jax.jit(lambda p, b: backbone.forward_fom(
        p["v_encoder"], cfg, b, compute_loss=False, dtype=dtype))
    fwd_loss = jax.jit(lambda p, b: backbone.forward_fom(
        p["v_encoder"], cfg, b, dtype=dtype))
    params = params_to_device(params)     # jit arg, not baked constant
    t0 = time.time()
    loss_sum, n_correct, n_frame = 0.0, 0, 0
    for batch in loader:
        jb = _device_batch(batch)
        logits = np.asarray(fwd(params, jb))         # (B, F, 100)
        targets = np.asarray(batch["fom_targets"])
        valid = targets >= 0
        pred = logits.argmax(-1)
        n_correct += int(((pred == targets) & valid).sum())
        n_frame += int(valid.sum())
        s, n = fwd_loss(params, jb)
        loss_sum += float(s)
    acc = n_correct / max(n_frame, 1)
    LOGGER.info("fom val acc: %.4f", acc)
    return {"loss": loss_sum / max(n_frame, 1), "acc": acc,
            "frame_per_s": n_frame / max(time.time() - t0, 1e-6)}
