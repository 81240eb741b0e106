"""DB builders (reference ``scripts/prepro_sub.py``, ``prepro_query.py``,
``convert_videodb.py``, ``prepro_tvc.py``) emitting herostore dbs with the
reference's sidecar JSON schema, so every downstream component is fed
identically."""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional

import numpy as np

from hero_tpu.data.store import HeroStoreWriter
from hero_tpu.prepro.sub_align import (empty_sub_fallback,
                                       process_single_vid_sub)
from hero_tpu.utils.logger import LOGGER

ROBERTA_META = {"CLS": 0, "SEP": 2, "PAD": 1, "BOS": 0, "EOS": 2,
                "MASK": 50264, "v_range": (3, 50260)}


def _write_json(path, obj):
    with open(path, "w") as f:
        json.dump(obj, f)


def build_sub_db(out_dir: str, vid2subs: Dict[str, List[dict]],
                 vid2nframe: Dict[str, int], frame_length: float,
                 tokenize: Callable[[str], List[int]],
                 meta: dict = ROBERTA_META, split: str = "train",
                 vid2idx: Optional[Dict[str, int]] = None) -> None:
    """Subtitle db: alignment + tokenization → store + vid2len.json +
    vid2max_frame_sub_len.json + vid2dur_idx.json + meta.json."""
    vid2len, vid2max_len = {}, {}
    # shape-stat sidecar: per-sub token lengths let bucket
    # selection/routing (suggest_shapes, video_fits_bucket) run without a
    # full-corpus store scan at driver startup — for HowTo100M-scale
    # corpora the startup scan is minutes-to-hours, repeated every restart
    vid2sub_len = {}
    dur_idx = {}
    total_overlap = 0
    with HeroStoreWriter(out_dir) as w:
        for i, (vid, subs) in enumerate(vid2subs.items()):
            nf = vid2nframe[vid]
            info, overlap = process_single_vid_sub(subs, frame_length, nf)
            total_overlap += overlap
            if subs:
                unique = sorted(info["unique_sub2frames"].items())
                input_ids = [tokenize(s["text"]) for s in subs]
            else:
                unique = sorted(empty_sub_fallback(nf).items())
                input_ids = [[] for _ in unique]
            rec = {
                "input_ids": input_ids,
                "unique_sub2frames": [(int(s), list(f)) for s, f in unique],
                "unmatched_frames": info.get("unmatched_frames", []),
            }
            w.put(vid, rec)
            vid2len[vid] = nf
            vid2sub_len[vid] = [len(t) for t in input_ids]
            max_txt = max((len(t) for t in input_ids), default=1)
            max_frames = info.get("max_matched_frame_len", nf) or nf
            vid2max_len[vid] = max_txt + max_frames
            idx = vid2idx[vid] if vid2idx else i
            dur_idx[vid] = [nf * frame_length, idx]
    _write_json(os.path.join(out_dir, "meta.json"), meta)
    _write_json(os.path.join(out_dir, "vid2len.json"), vid2len)
    _write_json(os.path.join(out_dir, "vid2max_frame_sub_len.json"),
                vid2max_len)
    _write_json(os.path.join(out_dir, "vid2dur_idx.json"),
                {split: dur_idx})
    _write_json(os.path.join(out_dir, "vid2sub_len.json"), vid2sub_len)
    LOGGER.info("sub db: %d videos, %d overlapping subs", len(vid2subs),
                total_overlap)


def build_video_db(out_dir: str,
                   vid2feat_paths: Dict[str, Dict[str, str]],
                   clip_interval: float = -1,
                   frame_length: float = 1.5) -> List[str]:
    """Concatenate per-frame 2D+3D features → (n, 4352) float16 store +
    id2nframe.json (reference convert_videodb.py:23-136).  Corrupted files
    are quarantined, not fatal.  ``clip_interval`` > 0 splits long videos
    into fixed-second clip records (HowTo100M rule)."""
    id2nframe = {}
    corrupted = []
    with HeroStoreWriter(out_dir) as w:
        for vid, paths in vid2feat_paths.items():
            try:
                parts = []
                for key in ("slowfast", "resnet"):
                    if key in paths:
                        with np.load(paths[key],
                                     allow_pickle=True) as z:
                            parts.append(z["features"])
                n = min(p.shape[0] for p in parts)
                feat = np.concatenate([p[:n] for p in parts],
                                      axis=-1).astype(np.float16)
            except Exception as e:  # quarantine corrupted inputs
                LOGGER.warning("corrupted features for %s: %s", vid, e)
                corrupted.append(vid)
                continue
            if clip_interval > 0:
                frames_per_clip = int(clip_interval / frame_length)
                for ci, st in enumerate(range(0, n, frames_per_clip)):
                    clip = feat[st:st + frames_per_clip]
                    key = f"{vid}_{ci}"
                    w.put(key, clip)
                    id2nframe[key] = clip.shape[0]
            else:
                w.put(vid, feat)
                id2nframe[vid] = feat.shape[0]
    _write_json(os.path.join(out_dir, "id2nframe.json"), id2nframe)
    if corrupted:
        _write_json(os.path.join(out_dir, "corrupted.json"), corrupted)
    return corrupted


def build_query_db(out_dir: str, query_jsonl: List[dict],
                   tokenize: Callable[[str], List[int]],
                   meta: dict = ROBERTA_META,
                   desc_key: str = "desc", id_key: str = "desc_id",
                   vid_key: str = "vid_name", ts_key: str = "ts") -> None:
    """TVR-style query db (reference prepro_query.py:32-160): store +
    id2len.json + query2video.json + query_data.jsonl."""
    id2len, q2v = {}, {}
    with HeroStoreWriter(out_dir) as w, open(
            os.path.join(out_dir, "query_data.jsonl"), "w") as jf:
        for item in query_jsonl:
            qid = str(item[id_key])
            ids = tokenize(item[desc_key])
            rec = {"input_ids": ids}
            if ts_key in item and item[ts_key] is not None:
                rec["target"] = item[ts_key]
            w.put(qid, rec)
            id2len[qid] = len(ids)
            if vid_key in item:
                q2v[qid] = item[vid_key]
            jf.write(json.dumps(item) + "\n")
    _write_json(os.path.join(out_dir, "meta.json"), meta)
    _write_json(os.path.join(out_dir, "id2len.json"), id2len)
    if q2v:
        _write_json(os.path.join(out_dir, "query2video.json"), q2v)


def build_qa_query_db(out_dir: str, qa_jsonl: List[dict],
                      tokenize: Callable[[str], List[int]],
                      meta: dict = ROBERTA_META) -> None:
    """TVQA/How2QA db: [q ; answers...] token lists + answer/ts targets."""
    id2len, q2v = {}, {}
    with HeroStoreWriter(out_dir) as w:
        for item in qa_jsonl:
            qid = str(item["qid"] if "qid" in item else item["desc_id"])
            q_ids = tokenize(item["q"])
            a_ids = [tokenize(a) for a in item["answers"]]
            w.put(qid, {"input_ids": [q_ids] + a_ids,
                        "target": item.get("answer_idx"),
                        "ts": item.get("ts")})
            id2len[qid] = len(q_ids)
            q2v[qid] = item["vid_name"]
    _write_json(os.path.join(out_dir, "meta.json"), meta)
    _write_json(os.path.join(out_dir, "id2len.json"), id2len)
    _write_json(os.path.join(out_dir, "query2video.json"), q2v)


def build_caption_db(root_dir: str, cap_jsonl: List[dict],
                     tokenize: Callable[[str], List[int]],
                     meta: dict = ROBERTA_META) -> None:
    """TVC cap.db + clip.db (reference prepro_tvc.py:22-137).

    cap.db keys are desc_ids (one row per caption); clip.db keys are
    clip_ids carrying the clip ts + all GT caption texts, which feed
    TvcValDataset-style per-clip validation (reference data/tvc.py:164-219).
    """
    cap_dir = os.path.join(root_dir, "cap.db")
    clip_dir = os.path.join(root_dir, "clip.db")
    vid2caps, cap2vid = {}, {}
    vid2clips, clip2vid = {}, {}
    with HeroStoreWriter(cap_dir) as w, HeroStoreWriter(clip_dir) as cw:
        for item in cap_jsonl:
            vid = item["vid_name"]
            clip_id = str(item.get("clip_id", item["descs"][0]["desc_id"]))
            clip2vid[clip_id] = vid
            vid2clips.setdefault(vid, []).append(clip_id)
            captions = []
            for d in item["descs"]:
                cid = str(d["desc_id"])
                w.put(cid, {"input_ids": tokenize(d["desc"]),
                            "ts": item["ts"],
                            "clip_id": clip_id})
                vid2caps.setdefault(vid, []).append(cid)
                cap2vid[cid] = vid
                captions.append({"id": cid, "text": d["desc"]})
            cw.put(clip_id, {"vid_name": vid, "ts": item["ts"],
                             "duration": item.get("duration"),
                             "captions": captions})
    _write_json(os.path.join(root_dir, "meta.json"), meta)
    _write_json(os.path.join(cap_dir, "vid2caps.json"), vid2caps)
    _write_json(os.path.join(cap_dir, "cap2vid.json"), cap2vid)
    _write_json(os.path.join(clip_dir, "vid2clips.json"), vid2clips)
    _write_json(os.path.join(clip_dir, "clip2vid.json"), clip2vid)


def emit_sub_len_sidecar(db_dir: str) -> str:
    """Backfill ``vid2sub_len.json`` for a sub db produced before the
    sidecar existed (one-time scan; afterwards driver startup does zero
    full-corpus store reads for bucket selection/routing).

    Usage: ``python -m hero_tpu.prepro.build_dbs <sub_db_dir> [...]``
    """
    from hero_tpu.data.store import HeroStore
    store = HeroStore(db_dir)
    with open(os.path.join(db_dir, "vid2len.json")) as f:
        vid2len = json.load(f)
    vid2sub_len = {vid: [len(t) for t in store[vid]["input_ids"]]
                   for vid in vid2len}
    path = os.path.join(db_dir, "vid2sub_len.json")
    _write_json(path, vid2sub_len)
    LOGGER.info("emitted %s (%d videos)", path, len(vid2sub_len))
    return path


if __name__ == "__main__":
    import sys
    for d in sys.argv[1:]:
        emit_sub_len_sidecar(d)
