"""Differential tests: our metric/NMS stack vs the reference implementation.

The reference evaluators are pure numpy and importable from
/root/reference — we run both on randomized submissions and require
identical outputs.  This pins the full protocol (IoU quirks, NMS order,
rounding, multi-GT rule) without copying code.
"""

import importlib.util
import random
import sys

import numpy as np
import pytest

from hero_tpu.evaluation import tvr_metrics as ours


def _load_ref(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_utils():
    return _load_ref("ref_tvr_eval_utils",
                     "/root/reference/utils/tvr_eval_utils.py")


@pytest.fixture(scope="module")
def ref_eval(monkeypatch_np_bool):
    return _load_ref("ref_tvr_standalone_eval",
                     "/root/reference/utils/tvr_standalone_eval.py")


@pytest.fixture(scope="module")
def monkeypatch_np_bool():
    # reference uses np.bool (removed in numpy>=1.24)
    if not hasattr(np, "bool"):
        np.bool = bool
        yield
        del np.bool
    else:
        yield


def random_predictions(rng, n=40, n_videos=6):
    preds = []
    for _ in range(n):
        st = rng.uniform(0, 100)
        preds.append([rng.randrange(n_videos), st,
                      st + rng.uniform(1, 40), rng.uniform(-5, 5)])
    return preds


def test_temporal_iou_matches(ref_utils):
    rng = random.Random(0)
    for _ in range(50):
        a = sorted([rng.uniform(0, 50), rng.uniform(0, 50)])
        b = sorted([rng.uniform(0, 50), rng.uniform(0, 50)])
        assert ours.temporal_iou(a, b) == pytest.approx(
            ref_utils.compute_temporal_iou(a, b))


def test_nms_matches(ref_utils):
    rng = random.Random(1)
    for trial in range(10):
        preds = [p[1:] for p in random_predictions(rng, n=30)]
        got = ours.temporal_nms([list(p) for p in preds], 0.5,
                                max_after_nms=10)
        want = ref_utils.temporal_non_maximum_suppression(
            [list(p) for p in preds], 0.5, max_after_nms=10)
        assert got == want, trial


def test_filter_vcmr_by_nms_matches(ref_utils):
    rng = random.Random(2)
    preds = random_predictions(rng, n=60)
    got = ours.filter_vcmr_by_nms([list(p) for p in preds], 0.5,
                                  max_before_nms=50, max_after_nms=20)
    want = ref_utils.filter_vcmr_by_nms([list(p) for p in preds], 0.5,
                                        max_before_nms=50, max_after_nms=20)
    assert got == want


def test_length_mask_matches(ref_utils):
    got = ours.generate_min_max_length_mask((3, 8, 8), 2, 6)
    want = ref_utils.generate_min_max_length_mask((3, 8, 8), 2, 6)
    np.testing.assert_array_equal(got, want)


def test_top_n_2d_matches(ref_utils):
    r = np.random.RandomState(3)
    arr = r.rand(12, 12)
    np.testing.assert_array_equal(ours.top_n_array_2d(arr, 7),
                                  ref_utils.top_n_array_2d(arr, 7))


def _make_submission_and_gt(seed, multi_gt=False):
    rng = random.Random(seed)
    n_videos, n_queries = 8, 25
    video2idx = {f"vid{i}": 100 + i for i in range(n_videos)}
    gt, vcmr, svmr, vr = [], [], [], []
    for qid in range(n_queries):
        vid = f"vid{rng.randrange(n_videos)}"
        st = rng.uniform(0, 60)
        ts = [st, st + rng.uniform(2, 30)]
        if multi_gt:
            ts = [[st + i, st + i + rng.uniform(2, 20)] for i in range(4)]
        gt.append({"desc_id": qid, "desc": "", "vid_name": vid, "ts": ts,
                   "type": rng.choice(["v", "t", "vt"])})
        preds = []
        for _ in range(30):
            pv = 100 + rng.randrange(n_videos)
            pst = rng.uniform(0, 80)
            preds.append([pv, pst, pst + rng.uniform(1, 35),
                          rng.uniform(0, 1)])
        preds.sort(key=lambda x: -x[3])
        vcmr.append({"desc_id": qid, "desc": "", "predictions": preds})
        svmr.append({"desc_id": qid, "desc": "",
                     "predictions": [[video2idx[vid]] + p[1:]
                                     for p in preds]})
        seen, vr_preds = set(), []
        for p in preds:
            if p[0] not in seen:
                seen.add(p[0])
                vr_preds.append(p)
        vr.append({"desc_id": qid, "desc": "", "predictions": vr_preds})
    sub = {"video2idx": video2idx, "VCMR": vcmr, "SVMR": svmr, "VR": vr}
    return sub, gt


@pytest.mark.parametrize("multi_gt", [False, True])
def test_eval_retrieval_matches_reference(ref_eval, multi_gt):
    import copy
    sub, gt = _make_submission_and_gt(4, multi_gt=multi_gt)
    got = ours.eval_retrieval(copy.deepcopy(sub), gt, verbose=False)
    want = ref_eval.eval_retrieval(copy.deepcopy(sub), gt, verbose=False)
    assert json.loads(json.dumps(got)) == json.loads(json.dumps(want))


import json  # noqa: E402
