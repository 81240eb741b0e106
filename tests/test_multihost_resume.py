"""Multi-host resume drill (VERDICT r3 #9): preemption + restart of a
TRUE 2-process ``jax.distributed`` training run through the real driver.

Resume equivalence and multi-host training were each tested alone
(test_resume_equivalence.py, test_multiprocess_eval.py); this drill
composes them — the risky path is the NON-primary rank, which never
writes restore.npz/restore_hps.json itself and must come back from the
primary's files on the shared output_dir.

Three sequential 2-process worlds over one prebuilt corpus:
1. ``full``   — uninterrupted 6-step run,
2. ``trunc``  — identical config preempted at step 3 (restore.npz),
3. ``resume`` — restart of (2); both ranks restore + fast_forward.

Asserts: final params of (3) == final params of (1) exactly; the
per-step task schedule and loss trajectory in rank 0's scalars.jsonl
agree step-for-step between the runs (steps 1-3 from the truncated leg,
4-6 from the resumed leg); and the resumed leg really restored (its
jsonl carries no duplicate steps 1-3)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAX_FRAMES = 16


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _write_configs(root, corpus):
    model_cfg = {
        "f_config": {"hidden_size": 32, "num_hidden_layers": 2,
                     "num_attention_heads": 4, "intermediate_size": 64,
                     "max_position_embeddings": 64, "vocab_size": 128,
                     "type_vocab_size": 2},
        "c_config": {"hidden_size": 32, "num_hidden_layers": 1,
                     "num_attention_heads": 4, "intermediate_size": 64,
                     "max_position_embeddings": 64, "type_vocab_size": 2},
        "q_config": {"hidden_size": 32, "num_hidden_layers": 0,
                     "num_attention_heads": 4, "intermediate_size": 64,
                     "max_position_embeddings": 64, "vocab_size": 128,
                     "type_vocab_size": 1},
    }
    mc = os.path.join(root, "model.json")
    with open(mc, "w") as f:
        json.dump(model_cfg, f)
    for name in ("full", "resumed"):
        cfg = dict(
            sub_txt_db=corpus["sub"], vfeat_db=corpus["vfeat"],
            model_config=mc, checkpoint=None,
            output_dir=os.path.join(root, name),
            max_clip_len=MAX_FRAMES, max_txt_len=12, vfeat_interval=1.5,
            vfeat_dim=64, train_batch_size=4,
            gradient_accumulation_steps=1, learning_rate=1e-3,
            valid_steps=1000, save_steps=3, num_train_steps=6,
            warmup_steps=2, grad_norm=1.0, sub_ctx_len=0, seed=11,
            bucket_n_subs=4, bucket_frames_per_sub=12,
            bucket_query_len=16, query_per_video=2,
            lw_neg_q=1.0, lw_neg_ctx=1.0, lw_st_ed=0.01,
            hard_pool_size=[4], hard_neg_weights=[10],
            hard_negtiave_start_step=[100], train_span_start_step=0,
            task_ratios={"mlm": 1, "vsm": 2},
        )
        with open(os.path.join(root, f"{name}.json"), "w") as f:
            json.dump(cfg, f)


def _launch(mode, root, tmp_path):
    """One 2-process world; returns None on pure rendezvous timeout."""
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "XLA_FLAGS": ""}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    outs = [str(tmp_path / f"{mode}_rank{r}.json") for r in range(2)]
    for attempt in range(2):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable,
                 os.path.join(REPO, "tests", "mp_resume_worker.py"),
                 str(r), "2", str(port), mode, root, outs[r]],
                cwd=REPO, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, env=env)
            for r in range(2)
        ]
        try:
            logs = [p.communicate(timeout=420)[0].decode() for p in procs]
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
                p.communicate()
            if attempt == 1:
                return None
            continue
        if all(p.returncode == 0 for p in procs):
            results = [json.load(open(o)) for o in outs]
            assert all(r["ok"] and r["nproc"] == 2 for r in results)
            return logs
        if attempt == 1:
            for p, log in zip(procs, logs):
                assert p.returncode == 0, (mode, log[-3000:])
    return None


def _scalars(out_dir):
    """step -> {task, loss} from rank 0's per-step JSONL."""
    rows = {}
    with open(os.path.join(out_dir, "log", "scalars.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            step = rec["step"]
            for k, v in rec.items():
                if k.startswith("smooth_loss/"):
                    rows.setdefault(step, {})["task"] = k.split("/", 1)[1]
                elif k == "loss":
                    rows.setdefault(step, {})["loss"] = v
    return rows


def test_two_process_resume_matches_uninterrupted(tmp_path):
    from hero_tpu.data.testing import build_synthetic_corpus
    root = str(tmp_path)
    corpus = build_synthetic_corpus(root, n_videos=6,
                                    max_frames=MAX_FRAMES, vfeat_dim=64)
    _write_configs(root, corpus)

    for mode in ("full", "trunc", "resume"):
        if _launch(mode, root, tmp_path) is None:
            # same loud-skip contract as test_multiprocess_eval
            import time
            import warnings
            msg = ("test_multihost_resume SKIPPED at mode=%s: 2-process "
                   "rendezvous timed out (machine saturated) — the "
                   "multi-host resume path was NOT exercised" % mode)
            warnings.warn(msg, RuntimeWarning)
            with open(os.path.join(REPO, ".mp_eval_skips.log"), "a") as f:
                f.write(f"{time.strftime('%Y-%m-%d %H:%M:%S')} {msg}\n")
            pytest.skip("2-process rendezvous timed out")
        if mode == "trunc":
            assert os.path.exists(
                os.path.join(root, "resumed", "restore.npz"))

    # exact final-params equality (subsumes schedule + trajectory: any
    # divergence in either would perturb the AdamW update stream)
    from hero_tpu.training.save import load_params
    want = load_params(os.path.join(root, "full", "ckpt",
                                    "model_step_6.npz"))
    got = load_params(os.path.join(root, "resumed", "ckpt",
                                   "model_step_6.npz"))
    import jax
    leaves_w, tree_w = jax.tree.flatten(want)
    leaves_g, tree_g = jax.tree.flatten(got)
    assert tree_w == tree_g
    for a, b in zip(leaves_w, leaves_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

    # explicit schedule + trajectory diff from the primary's JSONL
    full, res = _scalars(os.path.join(root, "full")), _scalars(
        os.path.join(root, "resumed"))
    assert sorted(full) == sorted(res) == [1, 2, 3, 4, 5, 6]
    # the resumed dir accumulated steps 1-3 from the truncated leg and
    # 4-6 from the resumed leg; duplicates would mean a replayed step
    with open(os.path.join(root, "resumed", "log",
                           "scalars.jsonl")) as f:
        steps_with_task = [json.loads(l)["step"] for l in f
                           if "smooth_loss/" in l]
    assert sorted(steps_with_task) == [1, 2, 3, 4, 5, 6]
    for step in range(1, 7):
        assert full[step]["task"] == res[step]["task"], step
        np.testing.assert_allclose(full[step]["loss"], res[step]["loss"],
                                   rtol=1e-6, err_msg=f"step {step}")
