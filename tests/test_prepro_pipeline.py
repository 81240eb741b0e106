"""Full L0→L4 pipeline: raw npz + jsonl → prepro CLIs → stores →
dataset → model forward."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from hero_tpu.config.model_config import tiny_hero_config
from hero_tpu.data.store import QueryTokStore, SubTokStore, VideoFeatStore
from hero_tpu.data.video import FixedShapes, VideoFeatSubTokDataset
from hero_tpu.models import pretrain


@pytest.fixture(scope="module")
def raw(tmp_path_factory):
    root = tmp_path_factory.mktemp("raw")
    r = np.random.RandomState(0)
    sf_dir = root / "slowfast"
    rn_dir = root / "resnet"
    sf_dir.mkdir(); rn_dir.mkdir()
    vid2nframe = {}
    subs = []
    queries = []
    qid = 0
    for i in range(4):
        vid = f"v{i}"
        nf = r.randint(8, 14)
        vid2nframe[vid] = nf
        np.savez(sf_dir / f"{vid}.npz",
                 features=r.randn(nf, 40).astype(np.float16))
        np.savez(rn_dir / f"{vid}.npz",
                 features=r.randn(nf, 24).astype(np.float16))
        track, t = [], 0.0
        for _ in range(3):
            t += r.uniform(0, 2)
            track.append({"text": f"hello world number {i}",
                          "start": round(t, 2),
                          "end": round(t + r.uniform(1, 5), 2)})
            t = track[-1]["end"]
        subs.append({"vid_name": vid, "sub": track})
        for _ in range(2):
            st = r.uniform(0, nf * 1.5 / 2)
            queries.append({"desc_id": qid, "desc": f"query about {i}",
                            "vid_name": vid,
                            "ts": [st, st + r.uniform(1, 5)],
                            "type": "vt"})
            qid += 1
    with open(root / "subs.jsonl", "w") as f:
        for s in subs:
            f.write(json.dumps(s) + "\n")
    with open(root / "queries.jsonl", "w") as f:
        for q in queries:
            f.write(json.dumps(q) + "\n")
    with open(root / "vid2nframe.json", "w") as f:
        json.dump(vid2nframe, f)
    return root, vid2nframe


def run_script(name, *args):
    out = subprocess.run(
        [sys.executable, f"scripts/{name}", *args], cwd="/root/repo",
        capture_output=True, text=True, timeout=300,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_prepro_pipeline_to_model(raw):
    root, vid2nframe = raw
    run_script("convert_videodb.py", "--slowfast_dir", str(root / "slowfast"),
               "--resnet_dir", str(root / "resnet"),
               "--output", str(root / "video_db"))
    run_script("prepro_sub.py", "--sub_jsonl", str(root / "subs.jsonl"),
               "--vid2nframe", str(root / "vid2nframe.json"),
               "--output", str(root / "sub_db"), "--tokenizer", "hash")
    run_script("prepro_query.py", "--query_jsonl",
               str(root / "queries.jsonl"),
               "--output", str(root / "query_db"), "--tokenizer", "hash")

    vfeat = VideoFeatStore(str(root / "video_db"), max_clip_len=16)
    assert vfeat["v0"].shape[1] == 64
    assert vfeat.name2nframe == {k: min(v, 16)
                                 for k, v in vid2nframe.items()}

    sub = SubTokStore(str(root / "sub_db"), max_clip_len=16)
    assert set(sub.id2len) == set(vid2nframe)
    # alignment invariant: every frame assigned to exactly one unique sub
    for vid in vid2nframe:
        frames = [f for _, fs in sub.vid_sub2frame[vid] for f in fs]
        assert len(frames) == len(set(frames))

    qdb = QueryTokStore(str(root / "query_db"))
    assert len(qdb.id2len) == 8
    assert len(qdb.query_data) == 8
    assert qdb.query2video["0"] == "v0"

    # ragged token ids (hash tokenizer >= 127-range ids) break the tiny
    # 128-vocab test model, so clamp for the forward check
    shapes = FixedShapes(n_subs=4, txt_len=16, frames_per_sub=12,
                         n_frames=16, n_queries=1, query_len=12,
                         max_masked=3, vfeat_dim=64)
    video_db = VideoFeatSubTokDataset(sub, vfeat, shapes, max_txt_len=10)
    item = video_db.video_item("v0")
    assert item["sub_mask"].sum() >= 1
    assert np.isfinite(item["c_v_feats"]).all()


def test_collect_video_feature_paths(tmp_path):
    """collect_video_feature_paths.py: nested tree walk, corrupted-file
    quarantine, reference pkl schema, and --feat_info conversion
    (reference scripts/collect_video_feature_paths.py:13-96)."""
    import pickle

    r = np.random.RandomState(1)
    feat = tmp_path / "feats"
    for show in ("showA", "showB"):
        (feat / "slowfast_features" / show).mkdir(parents=True)
        (feat / "resnet_features" / show).mkdir(parents=True)
    vids = {"showA": ["a1", "a2"], "showB": ["b1"]}
    for show, names in vids.items():
        for vid in names:
            nf = r.randint(6, 10)
            np.savez(feat / "slowfast_features" / show / f"{vid}.npz",
                     features=r.randn(nf, 40).astype(np.float16))
            np.savez(feat / "resnet_features" / show / f"{vid}.npz",
                     features=r.randn(nf + 1, 24).astype(np.float16))
    # corrupted slowfast + missing resnet
    (feat / "slowfast_features" / "showA" / "bad.npz").write_bytes(b"xx")
    np.savez(feat / "slowfast_features" / "showB" / "orphan.npz",
             features=r.randn(5, 40).astype(np.float16))

    run_script("collect_video_feature_paths.py",
               "--feature_dir", str(feat), "--output", str(tmp_path),
               "--dataset", "tv", "--nproc", "1")
    out = tmp_path / "tv"
    with open(out / "video_feat_info.pkl", "rb") as f:
        info = pickle.load(f)
    assert set(info) == {"a1", "a2", "b1", "bad", "orphan"}
    # record schema: (frame_len, slowfast_path, resnet_path, folder)
    fl, sf, rn, folder = info["a1"]
    assert fl >= 6 and sf.endswith("a1.npz") and rn.endswith("a1.npz")
    assert folder == "showA"
    assert info["bad"][1] == "" and info["bad"][0] == 0
    assert info["orphan"][2] == ""
    with open(out / "failed_slowfast_files.pkl", "rb") as f:
        assert pickle.load(f) == ["showA/bad"]
    with open(out / "failed_resnet_files.pkl", "rb") as f:
        failed_rn = pickle.load(f)
    assert set(failed_rn) == {"showA/bad", "showB/orphan"}

    # conversion consumes the pkl and skips failed records
    run_script("convert_videodb.py", "--feat_info",
               str(out / "video_feat_info.pkl"),
               "--output", str(tmp_path / "video_db"))
    vstore = VideoFeatStore(str(tmp_path / "video_db"), max_clip_len=16)
    assert set(vstore.name2nframe) == {"a1", "a2", "b1"}
    assert vstore["a1"].shape[1] == 64
