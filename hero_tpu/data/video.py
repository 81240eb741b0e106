"""Core video+subtitle dataset → fixed-shape numpy structs.

Re-design of reference ``VideoFeatSubTokDataset`` (``data/data.py:326-403``)
for static shapes: instead of ragged per-sub tensors compacted by a
``gather_index`` collate, every video becomes one struct of the canonical
backbone batch arrays (see ``hero_tpu/models/model.py``).  Per-sub frame
*features* are not duplicated — only the (S, Fs) frame-index arrays are
built here; the model gathers features on device.

Semantics preserved from the reference:
- per-sub text = [SEP] + context subs ``sub_idx-sub_ctx_len .. sub_idx``
  (``data/data.py:362-370``), truncated to ``txt_len``;
- subs with no matched frames keep their text but zero frame slots
  (reference uses a 0-masked zero-feature, ``data/data.py:376-381``);
- clip features clamped to ``max_clip_len``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, List, Optional, Sequence, Set

import numpy as np

from hero_tpu.const import VFEAT_DIM
from hero_tpu.data.store import (QueryTokStore, SubTokStore, TxtTokStore,
                                 VideoFeatStore)
from hero_tpu.utils.logger import LOGGER


@dataclasses.dataclass(frozen=True)
class FixedShapes:
    """Bucket sizes for one compiled step."""
    n_subs: int = 32           # S
    txt_len: int = 64          # Lt (incl. leading SEP)
    frames_per_sub: int = 16   # Fs
    n_frames: int = 100        # F (= max_clip_len)
    n_queries: int = 5         # Q (VSM/VCMR video-sampled)
    query_len: int = 32        # Lq (incl. leading CLS)
    max_masked: int = 10       # M (MLM positions per sub)
    vfeat_dim: int = VFEAT_DIM

    def replace(self, **kw) -> "FixedShapes":
        return dataclasses.replace(self, **kw)


class VideoFeatSubTokDataset:
    def __init__(self, sub_store: SubTokStore, vfeat_store: VideoFeatStore,
                 shapes: FixedShapes, max_txt_len: int = 60,
                 sub_ctx_len: int = 0):
        self.txt_db = sub_store
        self.img_db = vfeat_store
        self.shapes = shapes
        self.max_txt_len = max_txt_len
        self.sub_ctx_len = sub_ctx_len
        assert sub_ctx_len >= 0
        self.vids = list(sub_store.id2len.keys())
        self.vid2dur = sub_store.vid2dur
        self.vid2idx = sub_store.vid2idx

    def __len__(self) -> int:
        return len(self.vids)

    # -- text assembly ------------------------------------------------------
    def sub_tokens(self, example, sub_idx: int, num_subs: int,
                   exclude: Optional[Set[int]] = None) -> List[int]:
        """[SEP] + ctx-window token ids (truncated to txt_len)."""
        ids: List[int] = [self.txt_db.sep]
        for t in range(sub_idx - self.sub_ctx_len, sub_idx + 1):
            if 0 <= t < num_subs and (exclude is None or t not in exclude):
                toks = example["input_ids"][t]
                if self.max_txt_len != -1:
                    toks = toks[:self.max_txt_len]
                ids.extend(toks)
        return ids[:self.shapes.txt_len]

    # -- fixed-shape struct -------------------------------------------------
    def video_item(self, vid: str,
                   exclude_subs: Optional[Set[int]] = None
                   ) -> Dict[str, np.ndarray]:
        sp = self.shapes
        example = self.txt_db[vid]
        v_feat = self.img_db[vid][:sp.n_frames]
        nframes = v_feat.shape[0]
        sub2frames = self.txt_db.vid_sub2frame[vid]
        num_subs = len(sub2frames)
        if num_subs > sp.n_subs:
            LOGGER.debug("video %s: %d subs truncated to %d", vid,
                         num_subs, sp.n_subs)

        out = {
            "sub_input_ids": np.full((sp.n_subs, sp.txt_len),
                                     self.txt_db.pad, np.int32),
            "sub_txt_mask": np.zeros((sp.n_subs, sp.txt_len), np.float32),
            "sub_frame_idx": np.zeros((sp.n_subs, sp.frames_per_sub),
                                      np.int32),
            "sub_frame_mask": np.zeros((sp.n_subs, sp.frames_per_sub),
                                       np.float32),
            "sub_mask": np.zeros((sp.n_subs,), np.float32),
            "c_v_feats": np.zeros((sp.n_frames, sp.vfeat_dim), np.float32),
            "c_attn_masks": np.zeros((sp.n_frames,), np.float32),
        }
        out["c_v_feats"][:nframes] = v_feat
        out["c_attn_masks"][:nframes] = 1.0

        for row, (sub_idx, frames) in enumerate(sub2frames[:sp.n_subs]):
            ids = self.sub_tokens(example, sub_idx, num_subs, exclude_subs)
            out["sub_input_ids"][row, :len(ids)] = ids
            out["sub_txt_mask"][row, :len(ids)] = 1.0
            frames = [f for f in frames if f < nframes]
            frames = frames[:sp.frames_per_sub]
            if frames:
                out["sub_frame_idx"][row, :len(frames)] = frames
                out["sub_frame_mask"][row, :len(frames)] = 1.0
            out["sub_mask"][row] = 1.0
        return out

    def sub2frames(self, vid: str):
        return self.txt_db.vid_sub2frame[vid]

    def nframes(self, vid: str) -> int:
        return min(self.img_db.name2nframe[vid], self.shapes.n_frames)


class VideoOnlyDataset:
    """Video-only corpora (MSR-VTT/DiDeMo w/o ASR): one pseudo-subtitle
    [CLS] spanning all frames (reference data/vr_video_only.py:15-54).

    Requires ``shapes.frames_per_sub >= shapes.n_frames``.
    """

    def __init__(self, vfeat_store: VideoFeatStore, txt_store: TxtTokStore,
                 shapes: FixedShapes):
        assert shapes.frames_per_sub >= shapes.n_frames, (
            "video-only pseudo-sub spans the whole clip")
        self.img_db = vfeat_store
        self.txt_db = txt_store
        self.shapes = shapes
        self.vids = sorted(vfeat_store.name2nframe.keys())
        self.vid2idx = {v: i for i, v in enumerate(self.vids)}
        self.vid2dur = {}

    def __len__(self) -> int:
        return len(self.vids)

    def video_item(self, vid: str) -> Dict[str, np.ndarray]:
        sp = self.shapes
        v_feat = self.img_db[vid][:sp.n_frames]
        nframes = v_feat.shape[0]
        out = {
            "sub_input_ids": np.full((sp.n_subs, sp.txt_len),
                                     self.txt_db.pad, np.int32),
            "sub_txt_mask": np.zeros((sp.n_subs, sp.txt_len), np.float32),
            "sub_frame_idx": np.zeros((sp.n_subs, sp.frames_per_sub),
                                      np.int32),
            "sub_frame_mask": np.zeros((sp.n_subs, sp.frames_per_sub),
                                       np.float32),
            "sub_mask": np.zeros((sp.n_subs,), np.float32),
            "c_v_feats": np.zeros((sp.n_frames, sp.vfeat_dim), np.float32),
            "c_attn_masks": np.zeros((sp.n_frames,), np.float32),
        }
        out["c_v_feats"][:nframes] = v_feat
        out["c_attn_masks"][:nframes] = 1.0
        out["sub_input_ids"][0, 0] = self.txt_db.cls_
        out["sub_txt_mask"][0, 0] = 1.0
        out["sub_frame_idx"][0, :nframes] = np.arange(nframes)
        out["sub_frame_mask"][0, :nframes] = 1.0
        out["sub_mask"][0] = 1.0
        return out

    def nframes(self, vid: str) -> int:
        return min(self.img_db.name2nframe[vid], self.shapes.n_frames)


def stack_items(items: Sequence[Dict[str, np.ndarray]]
                ) -> Dict[str, np.ndarray]:
    """Batch = stack of fixed-shape structs (the whole collate)."""
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


def pad_query(ids: List[int], query_len: int, pad: int):
    ids = ids[:query_len]
    out = np.full((query_len,), pad, np.int32)
    out[:len(ids)] = ids
    mask = np.zeros((query_len,), np.float32)
    mask[:len(ids)] = 1.0
    return out, mask
