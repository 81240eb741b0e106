"""Dataset/loader factories (reference ``load_data.py:21-138``).

Thin facade over the stores/datasets so downstream code has the same
entry-point names as the reference: :func:`get_video_ids`,
:func:`load_video_sub_dataset`, :func:`load_video_only_dataset`,
:func:`build_downstream_dataset`.
"""

from __future__ import annotations

from typing import Optional, Tuple

from hero_tpu.data.downstream_tasks import (TvcCaptionStore,
                                            TvcTrainDataset, VcmrDataset,
                                            VideoQaDataset, ViolinDataset,
                                            VrDataset)
from hero_tpu.data.store import (QueryTokStore, SubTokStore, TxtTokStore,
                                 VideoFeatStore)
from hero_tpu.data.video import (FixedShapes, VideoFeatSubTokDataset,
                                 VideoOnlyDataset)


def get_video_ids(sub_store: SubTokStore) -> list:
    """Video ids of a subtitle db (reference load_data.py:21-28)."""
    return list(sub_store.id2len.keys())


def load_video_sub_dataset(vfeat_db: str, sub_txt_db: str,
                           shapes: FixedShapes, *,
                           vfeat_interval: float = 1.5,
                           max_clip_len: int = 100, max_txt_len: int = 60,
                           sub_ctx_len: int = 0) -> VideoFeatSubTokDataset:
    sub = SubTokStore(sub_txt_db, max_clip_len=max_clip_len)
    vfeat = VideoFeatStore(vfeat_db, frame_interval=vfeat_interval,
                           max_clip_len=max_clip_len)
    return VideoFeatSubTokDataset(sub, vfeat, shapes,
                                  max_txt_len=max_txt_len,
                                  sub_ctx_len=sub_ctx_len)


def load_video_only_dataset(vfeat_db: str, txt_meta_db: Optional[str],
                            shapes: FixedShapes, *,
                            vfeat_interval: float = 1.5,
                            max_clip_len: int = 100) -> VideoOnlyDataset:
    vfeat = VideoFeatStore(vfeat_db, frame_interval=vfeat_interval,
                           max_clip_len=max_clip_len)
    if txt_meta_db:
        txt = TxtTokStore(txt_meta_db)
    else:
        class _Meta:
            cls_, sep, pad, mask = 0, 2, 1, 50264
            id2len: dict = {}
        txt = _Meta()
    shapes = shapes.replace(
        n_subs=1, frames_per_sub=max(shapes.frames_per_sub,
                                     shapes.n_frames))
    return VideoOnlyDataset(vfeat, txt, shapes)


def build_downstream_dataset(task: str, video_db, query_db_path: str, *,
                             max_txt_len: int = 60, **kw):
    """Task-name → dataset switch (reference build_downstream_dataloaders,
    load_data.py:57-138)."""
    qdb = QueryTokStore(query_db_path, max_txt_len=max_txt_len)
    if task in ("tvr", "how2r", "didemo_video_sub", "didemo_video_only"):
        vids = getattr(video_db, "vids", [])
        return VcmrDataset(vids, video_db, qdb, **kw)
    if task in ("msrvtt_video_sub", "msrvtt_video_only", "vr"):
        vids = getattr(video_db, "vids", [])
        return VrDataset(vids, video_db, qdb, **kw)
    if task in ("tvqa", "how2qa"):
        return VideoQaDataset(list(qdb.id2len.keys()), video_db, qdb, **kw)
    if task == "violin":
        qids = [q for q in qdb.id2len if q.endswith("_0")]
        return ViolinDataset(qids, video_db, qdb, **kw)
    raise ValueError(f"Unrecognized task {task}")
