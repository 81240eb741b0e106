"""herostore — the feature/text database layer (replaces LMDB).

The reference stores everything in LMDB + lz4 + msgpack_numpy
(``data/data.py:52-211``), three C libraries this framework replaces with
one simple, mmap-friendly record store:

- ``data.bin``: concatenated payload bytes;
- ``index.bin``: sorted (key, offset, length, codec) table (msgpack);
- the reference's sidecar JSONs (``meta.json``, ``id2len.json``,
  ``vid2len.json``, ``id2nframe.json``, ``query2video.json``,
  ``query_data.jsonl``, …) are kept verbatim next to it, so dataset code
  sees the same contract as the reference's dbs.

Payload codecs: ``msg`` (msgpack, with a numpy extension type) and ``raw``
(bare ndarray: dtype/shape header + bytes — zero-copy reads via mmap for
the hot 4352-d frame features).  Reads go through the native C++ reader
(``hero_tpu/native/libherostore``) when built, else the pure-python mmap
path — identical bytes either way.

Converting reference LMDBs: ``scripts/convert_lmdb.py`` (requires the
``lmdb``/``lz4`` python packages, absent here by design).
"""

from __future__ import annotations

import json
import mmap
import os
import struct
from typing import Any, Dict, Iterator, Optional, Tuple

import msgpack
import numpy as np

_ND_EXT = 42  # msgpack ext type id for ndarrays


def _pack_default(obj):
    if isinstance(obj, np.ndarray):
        header = msgpack.packb(
            (obj.dtype.str, obj.shape), use_bin_type=True)
        return msgpack.ExtType(
            _ND_EXT, struct.pack("<I", len(header)) + header
            + np.ascontiguousarray(obj).tobytes())
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    raise TypeError(f"cannot serialize {type(obj)}")


def _unpack_ext(code, data):
    if code == _ND_EXT:
        (hlen,) = struct.unpack_from("<I", data, 0)
        dtype_str, shape = msgpack.unpackb(data[4:4 + hlen], raw=False)
        arr = np.frombuffer(data, dtype=np.dtype(dtype_str),
                            offset=4 + hlen)
        return arr.reshape(shape)
    return msgpack.ExtType(code, data)


def pack_value(value: Any) -> Tuple[bytes, str]:
    if isinstance(value, np.ndarray):
        header = msgpack.packb((value.dtype.str, value.shape),
                               use_bin_type=True)
        return (struct.pack("<I", len(header)) + header
                + np.ascontiguousarray(value).tobytes()), "raw"
    return msgpack.packb(value, use_bin_type=True,
                         default=_pack_default), "msg"


def unpack_value(buf: bytes, codec: str) -> Any:
    if codec == "raw":
        (hlen,) = struct.unpack_from("<I", buf, 0)
        dtype_str, shape = msgpack.unpackb(bytes(buf[4:4 + hlen]),
                                           raw=False)
        arr = np.frombuffer(buf, dtype=np.dtype(dtype_str),
                            offset=4 + hlen)
        return arr.reshape(shape)
    return msgpack.unpackb(bytes(buf), raw=False, ext_hook=_unpack_ext)


class HeroStoreWriter:
    """Append-only writer.  NOT thread safe (like the reference's TxtLmdb
    write path, data/data.py:162-163)."""

    def __init__(self, db_dir: str):
        os.makedirs(db_dir, exist_ok=True)
        self.db_dir = db_dir
        self._data = open(os.path.join(db_dir, "data.bin"), "wb")
        self._index: Dict[str, Tuple[int, int, str]] = {}
        self._offset = 0

    def put(self, key: str, value: Any) -> None:
        payload, codec = pack_value(value)
        self._data.write(payload)
        self._index[key] = (self._offset, len(payload), codec)
        self._offset += len(payload)

    def close(self) -> None:
        self._data.close()
        with open(os.path.join(self.db_dir, "index.bin"), "wb") as f:
            f.write(msgpack.packb(self._index, use_bin_type=True))

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def _native_reader():
    try:
        from hero_tpu.native import herostore as native
        return native if native.available() else None
    except Exception:
        return None


class HeroStore:
    """Read-only mmap'd store: ``store[key] -> decoded value``."""

    def __init__(self, db_dir: str):
        self.db_dir = db_dir
        with open(os.path.join(db_dir, "index.bin"), "rb") as f:
            self._index = msgpack.unpackb(f.read(), raw=False)
        self._native = _native_reader()
        path = os.path.join(db_dir, "data.bin")
        if self._native is not None:
            self._handle = self._native.open(path)
            self._mm = None
        else:
            self._f = open(path, "rb")
            size = os.path.getsize(path)
            self._mm = (mmap.mmap(self._f.fileno(), size,
                                  access=mmap.ACCESS_READ)
                        if size else b"")

    def __contains__(self, key: str) -> bool:
        return key in self._index

    def __len__(self) -> int:
        return len(self._index)

    def keys(self):
        return self._index.keys()

    def __getitem__(self, key: str) -> Any:
        off, length, codec = self._index[key]
        if self._native is not None:
            buf = self._native.read(self._handle, off, length)
        else:
            buf = self._mm[off:off + length]
        return unpack_value(buf, codec)


# ---------------------------------------------------------------------------
# typed wrappers mirroring the reference db classes (data/data.py:52-323)
# ---------------------------------------------------------------------------

def _load_json(db_dir, name, default=None):
    path = os.path.join(db_dir, name)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return default


class VideoFeatStore:
    """Per-video float16 (nframes, 4352) features
    (reference VideoFeatLmdb, data/data.py:52-122)."""

    def __init__(self, img_dir: str, feat_version: str = "",
                 frame_interval: float = 1.5, compress: bool = False,
                 max_clip_len: int = -1):
        self.img_dir = img_dir
        self.frame_interval = frame_interval
        self.max_clip_len = max_clip_len
        self.store = HeroStore(img_dir)
        self.name2nframe = _load_json(img_dir, "id2nframe.json", {})
        if isinstance(self.name2nframe, dict) and max_clip_len != -1:
            self.name2nframe = {k: min(v, max_clip_len)
                                for k, v in self.name2nframe.items()}

    def __contains__(self, vid):
        return vid in self.store

    def __getitem__(self, vid: str) -> np.ndarray:
        # keep the storage dtype (float16 — the reference VideoFeatLmdb
        # also yields float16, data/data.py:52-122): the fp32 upcast used
        # to cost ~40% of host batch-assembly time and doubled the
        # host→device bytes; models cast at ingestion
        # (embed.project_image_features)
        feat = self.store[vid]
        if self.max_clip_len != -1:
            feat = feat[:self.max_clip_len]
        return np.asarray(feat)


class TxtTokStore:
    """Tokenized text store + special-token metadata
    (reference TxtTokLmdb, data/data.py:134-211)."""

    def __init__(self, db_dir: str, max_txt_len: int = -1):
        self.db_dir = db_dir
        self.store = HeroStore(db_dir)
        meta = _load_json(db_dir, "meta.json", {})
        self.meta = meta
        self.cls_ = meta.get("CLS", 0)
        self.sep = meta.get("SEP", 2)
        self.pad = meta.get("PAD", 1)
        self.bos = meta.get("BOS", 0)
        self.eos = meta.get("EOS", 2)
        self.mask = meta.get("MASK", 50264)
        self.v_range = meta.get("v_range", (3, 50260))
        self.max_txt_len = max_txt_len
        id2len = _load_json(db_dir, "id2len.json", {})
        if max_txt_len == -1:
            self.id2len = id2len
        else:
            self.id2len = {i: l for i, l in id2len.items()
                           if l <= max_txt_len}

    def __getitem__(self, id_: str) -> Any:
        return self.store[id_]


class SubTokStore(TxtTokStore):
    """Subtitle store with sub→frame precompute
    (reference SubTokLmdb, data/data.py:214-268)."""

    def __init__(self, db_dir: str, max_clip_len: int = -1):
        super().__init__(db_dir, max_txt_len=-1)
        self.max_clip_len = max_clip_len
        self.vid2max_len = _load_json(db_dir,
                                      "vid2max_frame_sub_len.json", {})
        self.id2len = _load_json(db_dir, "vid2len.json", {})
        # prepro-emitted shape-stat sidecar (per-sub token lengths): lets
        # suggest_shapes/video_fits_bucket avoid re-reading every example
        # at driver startup; None → consumers fall back to scanning
        self.vid2sub_lens = _load_json(db_dir, "vid2sub_len.json", None)
        self.vid2dur, self.vid2idx = {}, {}
        video_data = _load_json(db_dir, "vid2dur_idx.json")
        if video_data:
            for key, info in video_data.items():
                self.vid2dur[key] = [{"vid_name": k, "duration": v[0]}
                                     for k, v in info.items()]
                self.vid2idx[key] = {k: v[1] for k, v in info.items()}
        self.vid_sub2frame, self.vid2vonly_frames = self._compute()

    def _compute(self):
        vid_sub2frame, vid2vonly = {}, {}
        for vid in list(self.id2len.keys()):
            ex = self.store[vid]
            unmatched = ex.get("unmatched_frames", [])
            sen2frame = []
            cutoff = False
            for sub_idx, frames in ex["unique_sub2frames"]:
                if self.max_clip_len > -1:
                    in_range = [i for i in sorted(frames)
                                if i < self.max_clip_len]
                    cutoff = cutoff or len(in_range) != len(frames)
                    if len(in_range) or len(frames) == 0:
                        sen2frame.append((sub_idx, in_range))
                    if cutoff:
                        break
                else:
                    sen2frame.append((sub_idx, list(frames)))
            vid_sub2frame[vid] = sen2frame
            vid2vonly[vid] = [i for i in unmatched
                              if i < self.max_clip_len]
            self.id2len[vid] = min(self.id2len[vid], self.max_clip_len)
        return vid_sub2frame, vid2vonly


class QueryTokStore(TxtTokStore):
    """Query store (reference QueryTokLmdb, data/data.py:271-296)."""

    def __init__(self, db_dir: str, max_txt_len: int = -1):
        super().__init__(db_dir, max_txt_len)
        self.query2video = _load_json(db_dir, "query2video.json", {})
        self.video2query: Dict[str, list] = {}
        for q, v in self.query2video.items():
            self.video2query.setdefault(v, []).append(q)
        self.query_data = {}
        self._query_data_rows = []
        path = os.path.join(db_dir, "query_data.jsonl")
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    if line.strip():
                        self._query_data_rows.append(json.loads(line))
        self.query_data = self._key_query_data()

    def _key_query_data(self) -> Dict[str, dict]:
        return {str(item["desc_id"]): item
                for item in self._query_data_rows}


class MsrvttQueryTokStore(QueryTokStore):
    """MSR-VTT query store (reference MsrvttQueryTokLmdb,
    data/vr.py:50-61): query rows are keyed by ``sen_id``, falling back
    wholesale to ``retrieval_key`` if any row lacks it (and finally to
    ``desc_id`` so non-MSR-VTT-shaped corpora still load)."""

    def _key_query_data(self) -> Dict[str, dict]:
        for key in ("sen_id", "retrieval_key", "desc_id"):
            try:
                return {str(item[key]): item
                        for item in self._query_data_rows}
            except KeyError:
                continue
        return {}


class ShardedVideoFeatStore:
    """HowTo100M-style sharded feature dbs (reference vfeat_shards,
    pretrain.py:45-57): several VideoFeatStore shards behind one lookup."""

    def __init__(self, shard_dirs, frame_interval: float = 1.5,
                 max_clip_len: int = -1):
        self.shards = [VideoFeatStore(d, frame_interval=frame_interval,
                                      max_clip_len=max_clip_len)
                       for d in shard_dirs]
        self.frame_interval = frame_interval
        self.max_clip_len = max_clip_len
        self.name2nframe = {}
        self._vid2shard = {}
        for s in self.shards:
            self.name2nframe.update(s.name2nframe)
            for vid in s.name2nframe:
                self._vid2shard[vid] = s

    def __contains__(self, vid):
        return vid in self._vid2shard

    def __getitem__(self, vid):
        return self._vid2shard[vid][vid]
