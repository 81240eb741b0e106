"""Downstream eval loops: VR-only, VideoQA accuracy, VIOLIN accuracy.

Host-side protocol of reference ``eval_vr.py:137-305``,
``eval_videoQA.py:120-173``, ``eval_violin.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hero_tpu.config.model_config import HeroConfig
from hero_tpu.evaluation.vcmr_eval import VcmrEvalOpts, validate_full_vcmr
from hero_tpu.models import videoqa as videoqa_lib
from hero_tpu.models import violin as violin_lib
from hero_tpu.models.pretrain import VsmConfig
from hero_tpu.utils.misc import params_to_device


def validate_full_vr(params, cfg: HeroConfig, vsm: VsmConfig,
                     opts: VcmrEvalOpts, video_batches, query_batches,
                     video_ids, video2idx_global, query_data,
                     dtype=jnp.bfloat16):
    """VR-only two-phase eval (reference eval_vr.py:137-305)."""
    opts = dataclasses.replace(opts, full_eval_tasks=("VR",))
    return validate_full_vcmr(params, cfg, vsm, opts, video_batches,
                              query_batches, video_ids, video2idx_global,
                              query_data, dtype=dtype)


def validate_videoqa(params, cfg: HeroConfig,
                     batches: Iterable[Dict[str, Any]], *,
                     num_answers: int = 5, dtype=jnp.bfloat16
                     ) -> Tuple[Dict[str, float], Dict[Any, int],
                                Dict[Any, np.ndarray]]:
    """Answer argmax + accuracy (reference eval_videoQA.py:120-173).

    Batches carry host ``qids`` plus device arrays; ``targets`` may hold -1
    for unlabeled test splits.  Returns (log, qid→answer, qid→logits).
    """
    # params as a jit ARGUMENT (closing over them bakes the weights into
    # the program: flagship-size constants exceed remote-compile limits)
    fwd = jax.jit(lambda p, b: videoqa_lib.forward_videoqa(
        p, cfg, b, num_answers=num_answers, compute_loss=False,
        dtype=dtype))
    params = params_to_device(params)
    results: Dict[Any, int] = {}
    logits_out: Dict[Any, np.ndarray] = {}
    n_correct, n_labeled, n_ex = 0, 0, 0
    for batch in batches:
        qids = batch.pop("qids")
        targets = np.asarray(batch.pop("targets_host", batch.get("targets")))
        logits = np.asarray(fwd(params,
                                {k: jnp.asarray(v)
                                 for k, v in batch.items()
                                 if k != "targets"}))
        answers = logits.argmax(-1)
        for i, qid in enumerate(qids):
            results[qid] = int(answers[i])
            logits_out[qid] = logits[i]
        labeled = targets.reshape(-1) >= 0
        n_correct += int(((answers == targets.reshape(-1)) & labeled).sum())
        n_labeled += int(labeled.sum())
        n_ex += len(qids)
    log = {"n_ex": n_ex}
    if n_labeled:
        log["acc"] = n_correct / n_labeled
    return log, results, logits_out


def validate_violin(params, cfg: HeroConfig,
                    batches: Iterable[Dict[str, Any]], *,
                    dtype=jnp.bfloat16) -> Tuple[Dict[str, float],
                                                 Dict[Any, int]]:
    """Binary accuracy from sigmoid > 0.5 (reference eval_violin.py)."""
    fwd = jax.jit(lambda p, b: violin_lib.forward_violin(
        p, cfg, b, compute_loss=False, dtype=dtype))
    params = params_to_device(params)     # jit arg, not baked constant
    results: Dict[Any, int] = {}
    n_correct, n_labeled, n_ex = 0, 0, 0
    for batch in batches:
        qids = batch.pop("qids")
        targets = np.asarray(batch.pop("targets_host",
                                       batch.get("targets"))).reshape(-1)
        logits = np.asarray(fwd(params,
                                {k: jnp.asarray(v)
                                 for k, v in batch.items()
                                 if k != "targets"})).reshape(-1)
        pred = (1.0 / (1.0 + np.exp(-logits)) > 0.5).astype(np.int64)
        for i, qid in enumerate(qids):
            results[qid] = int(pred[i])
        labeled = targets >= 0
        n_correct += int(((pred == targets) & labeled).sum())
        n_labeled += int(labeled.sum())
        n_ex += len(qids)
    log = {"n_ex": n_ex}
    if n_labeled:
        log["acc"] = n_correct / n_labeled
    return log, results
