"""Differential test: our sub↔frame alignment vs the reference's.

The reference prepro module isn't importable (lmdb/cytoolz at module
scope), so its two pure functions are exec'd from source in a sandboxed
namespace and compared on randomized subtitle tracks.
"""

import math
import random

import numpy as np
import pytest

from hero_tpu.prepro import sub_align


@pytest.fixture(scope="module")
def ref_fns():
    src = open("/root/reference/scripts/prepro_sub.py").read()
    # extract the two pure functions by line ranges bounded by their defs
    lines = src.split("\n")
    def grab(name):
        start = next(i for i, l in enumerate(lines)
                     if l.startswith(f"def {name}"))
        end = start + 1
        while end < len(lines) and (not lines[end]
                                    or (not lines[end][0].isalpha()
                                        and lines[end][0] != "@")
                                    or lines[end].startswith(")")):
            end += 1
        return "\n".join(lines[start:end])

    class _Np:
        def __getattr__(self, k):
            if k == "int":
                return int
            return getattr(np, k)

    ns = {"np": _Np(), "copy": __import__("copy"),
          "flat_list_of_lists": lambda ll: [x for l in ll for x in l]}
    exec(grab("temporal_iou"), ns)
    exec(grab("process_single_vid_sub"), ns)
    return ns


def random_subs(rng, n_subs, frame_length):
    t = 0.0
    subs = []
    for _ in range(n_subs):
        t += rng.uniform(0.0, 4.0)
        # long durations create overlaps with the next sub
        dur = rng.uniform(0.5, 20.0 if rng.random() < 0.1 else 6.0)
        subs.append({"text": " ".join("w" * rng.randint(1, 8)),
                     "start": round(t, 3), "end": round(t + dur, 3)})
        t += 0.01
    # starts must be sorted (they are, by construction)
    return subs


@pytest.mark.parametrize("seed", range(8))
def test_alignment_matches_reference(ref_fns, seed):
    rng = random.Random(seed)
    frame_length = 1.5
    n_frames = rng.randint(1, 40)
    subs = random_subs(rng, rng.randint(1, 10), frame_length)
    got_info, got_overlap = sub_align.process_single_vid_sub(
        subs, frame_length, n_frames)
    want_info, want_overlap = ref_fns["process_single_vid_sub"](
        subs, frame_length, n_frames)
    assert got_overlap == want_overlap
    for key in ("unique_sub2frames", "sub2frames", "frame2subs",
                "frame2unique_sub", "unmatched_frames",
                "max_matched_frame_len", "max_unmatched_group_len",
                "extra_long_subs", "num_of_frames", "max_sub_length"):
        assert got_info[key] == want_info[key], (key, seed)
    assert got_info["max_gap_time"] == pytest.approx(
        float(want_info["max_gap_time"]), abs=1e-5)
    assert got_info["max_sub_duration"] == pytest.approx(
        float(want_info["max_sub_duration"]), abs=1e-5)


def test_empty_inputs(ref_fns):
    got = sub_align.process_single_vid_sub([], 1.5, 10)
    want = ref_fns["process_single_vid_sub"]([], 1.5, 10)
    assert got[0] == want[0] and got[1] == want[1]


def test_empty_sub_fallback():
    out = sub_align.empty_sub_fallback(12, bucket=5)
    assert out == {0: [0, 1, 2, 3, 4], 1: [5, 6, 7, 8, 9], 2: [10, 11]}
