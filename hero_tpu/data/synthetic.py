"""Synthetic fixed-shape batches for every task.

Used by unit tests, ``bench.py`` and ``__graft_entry__.py``; shapes follow
the canonical batch contract (``hero_tpu/models/model.py`` docstring) at
either reference-recipe or tiny sizes.  Values are random but structurally
valid (contiguous frame assignments per sub, in-range span targets, BERT
80/10/10-style MLM masking, 15% FOM shuffling — mirroring the reference
datasets' semantics in ``data/mlm.py``, ``data/mfm.py``, ``data/fom.py``,
``data/vsm.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

from hero_tpu.const import VFEAT_DIM


@dataclasses.dataclass(frozen=True)
class BatchShape:
    """Fixed bucket sizes for one compiled step."""
    batch: int = 8            # videos
    n_subs: int = 8           # subtitle rows per video
    txt_len: int = 40         # BPE tokens per sub (incl. leading SEP)
    frames_per_sub: int = 16  # frame slots per sub
    n_frames: int = 100       # clip length (MAX_FRM_SEQ_LEN)
    n_queries: int = 2        # queries per video (VSM)
    query_len: int = 30
    vfeat_dim: int = VFEAT_DIM
    vocab_size: int = 50272
    max_masked: int = 12      # MLM positions per sub

    def replace(self, **kw) -> "BatchShape":
        return dataclasses.replace(self, **kw)


TINY = BatchShape(batch=2, n_subs=3, txt_len=8, frames_per_sub=4,
                  n_frames=16, n_queries=2, query_len=6, vfeat_dim=64,
                  vocab_size=128, max_masked=3)

# reference pretrain recipe: 32 videos/GPU (pretrain-tv-16gpu.json)
PRETRAIN_RECIPE = BatchShape(batch=32)


def base_batch(shape: BatchShape, seed: int = 0) -> Dict[str, np.ndarray]:
    """Backbone ('repr') batch with contiguous sub→frame assignment."""
    r = np.random.RandomState(seed)
    B, S, Lt = shape.batch, shape.n_subs, shape.txt_len
    Fs, F = shape.frames_per_sub, shape.n_frames
    sub_input_ids = r.randint(3, shape.vocab_size,
                              (B, S, Lt)).astype(np.int32)
    txt_lens = r.randint(Lt // 2, Lt + 1, (B, S))
    sub_txt_mask = (np.arange(Lt)[None, None, :]
                    < txt_lens[..., None]).astype(np.float32)
    sub_input_ids[sub_txt_mask == 0] = 1  # pad idx

    # each sub s covers frames [s*F//S, s*F//S + n) like prepro_sub's
    # temporal-IoU assignment produces contiguous unique ranges
    frames_per = max(1, F // S)
    starts = (np.arange(S) * frames_per)[None, :, None]
    offs = np.arange(Fs)[None, None, :]
    sub_frame_idx = np.minimum(starts + offs, F - 1).astype(np.int32)
    n_valid = r.randint(1, min(Fs, frames_per) + 1, (B, S))
    sub_frame_mask = (np.arange(Fs)[None, None, :]
                      < n_valid[..., None]).astype(np.float32)
    sub_frame_idx = np.broadcast_to(sub_frame_idx, (B, S, Fs)).copy()

    nf = r.randint(F // 2, F + 1, (B,))
    c_attn_masks = (np.arange(F)[None, :] < nf[:, None]).astype(np.float32)
    # float16 mirrors the production store dtype (VideoFeatStore yields
    # the storage float16; models cast at ingestion)
    c_v_feats = r.randn(B, F, shape.vfeat_dim).astype(np.float16)
    c_v_feats *= c_attn_masks[..., None]

    return {
        "sub_input_ids": sub_input_ids,
        "sub_txt_mask": sub_txt_mask,
        "sub_frame_idx": sub_frame_idx,
        "sub_frame_mask": sub_frame_mask,
        "sub_mask": np.ones((B, S), np.float32),
        "c_v_feats": c_v_feats,
        "c_attn_masks": c_attn_masks,
    }


def vsm_batch(shape: BatchShape, seed: int = 0) -> Dict[str, np.ndarray]:
    r = np.random.RandomState(seed + 1)
    b = base_batch(shape, seed)
    B, Q, Lq, F = (shape.batch, shape.n_queries, shape.query_len,
                   shape.n_frames)
    q_ids = r.randint(3, shape.vocab_size, (B, Q, Lq)).astype(np.int32)
    q_lens = r.randint(Lq // 2, Lq + 1, (B, Q))
    q_mask_tok = (np.arange(Lq)[None, None, :]
                  < q_lens[..., None]).astype(np.float32)
    q_ids[q_mask_tok == 0] = 1
    st = r.randint(0, F // 2, (B, Q))
    ed = st + r.randint(0, F // 2, (B, Q))
    b.update({
        "query_input_ids": q_ids,
        "query_attn_masks": q_mask_tok,
        "q_mask": np.ones((B, Q), np.float32),
        "targets": np.stack([st, np.minimum(ed, F - 1)],
                            -1).astype(np.int32),
    })
    return b


def mlm_batch(shape: BatchShape, seed: int = 0) -> Dict[str, np.ndarray]:
    r = np.random.RandomState(seed + 2)
    b = base_batch(shape, seed)
    B, S, Lt, M = (shape.batch, shape.n_subs, shape.txt_len,
                   shape.max_masked)
    mask_pos = r.randint(0, Lt, (B, S, M)).astype(np.int32)
    labels = np.where(r.rand(B, S, M) < 0.8,
                      r.randint(3, shape.vocab_size, (B, S, M)),
                      -1).astype(np.int32)
    # apply BERT masking to the inputs at labeled positions (80% [MASK]=3)
    for bi in range(B):
        for si in range(S):
            for mi in range(M):
                if labels[bi, si, mi] >= 0:
                    b["sub_input_ids"][bi, si, mask_pos[bi, si, mi]] = 3
    b["mlm_mask_pos"] = mask_pos
    b["mlm_labels"] = labels
    return b


def mfm_batch(shape: BatchShape, seed: int = 0) -> Dict[str, np.ndarray]:
    r = np.random.RandomState(seed + 3)
    b = base_batch(shape, seed)
    B, F = shape.batch, shape.n_frames
    m = (r.rand(B, F) < 0.15).astype(np.float32) * b["c_attn_masks"]
    # ensure at least one masked frame per batch
    m[:, 0] = b["c_attn_masks"][:, 0]
    b["c_v_masks"] = m
    return b


def fom_batch(shape: BatchShape, seed: int = 0) -> Dict[str, np.ndarray]:
    r = np.random.RandomState(seed + 4)
    b = base_batch(shape, seed)
    B, F = shape.batch, shape.n_frames
    orders = np.tile(np.arange(F, dtype=np.int32), (B, 1))
    targets = np.full((B, F), -1, np.int32)
    for bi in range(B):
        nf = int(b["c_attn_masks"][bi].sum())
        sel = r.choice(nf, max(1, int(nf * 0.15)), replace=False)
        perm = r.permutation(sel)
        orders[bi, sel] = perm
        targets[bi, perm] = sel.astype(np.int32)
    b["shuffled_orders"] = orders
    b["fom_targets"] = targets
    return b


def task_batch(task: str, shape: BatchShape,
               seed: int = 0) -> Dict[str, np.ndarray]:
    if task == "vsm":
        return vsm_batch(shape, seed)
    if task.startswith("mlm"):
        return mlm_batch(shape, seed)
    if task in ("mfm-nce", "mffr"):
        return mfm_batch(shape, seed)
    if task == "fom":
        return fom_batch(shape, seed)
    return base_batch(shape, seed)


# ---------------------------------------------------------------------------
# TV-distribution VSM batches, packed or unpacked (bench.py,
# tools/packing_bench.py) — real per-video shapes from
# hero_tpu.data.occupancy.sample_tv_video laid out into either bucket so
# the two layouts carry the SAME examples and the packed/unpacked
# throughput ratio is measured on matched content.  One asymmetry: the
# unpacked layout clamps each sub to its per-row budgets (min(tl, Lt),
# min(fl, Fs)) exactly as the reference's fixed bucket would, while the
# packed layout keeps full subs in its larger rows — subs longer than the
# unpacked text budget carry slightly fewer tokens there.  FLOPs are
# shape-fixed in both layouts, so throughput numbers are unaffected.
# ---------------------------------------------------------------------------

TV_UNPACKED = BatchShape(batch=32, n_subs=16, txt_len=40,
                         frames_per_sub=16, n_frames=100, n_queries=2,
                         query_len=30)
# measured TV fit for the packed bucket (tools/packing_bench.py): rows of
# (16 f + 88 t) hold 3-5 dialogue subs; 0.8% of subs dropped over 512
# sampled videos vs 7.2% at the unpacked bucket's n_subs=16 truncation
TV_PACKED = BatchShape(batch=32, n_subs=4, txt_len=88,
                       frames_per_sub=16, n_frames=100, n_queries=2,
                       query_len=30)


def _tv_common(r, B, shape: BatchShape):
    return {
        "c_v_feats": r.randn(B, shape.n_frames,
                             shape.vfeat_dim).astype(np.float16),
        "c_attn_masks": np.zeros((B, shape.n_frames), np.float32),
        "query_input_ids": r.randint(
            3, shape.vocab_size,
            (B, shape.n_queries, shape.query_len)).astype(np.int32),
        "query_attn_masks": np.ones(
            (B, shape.n_queries, shape.query_len), np.float32),
        "q_mask": np.ones((B, shape.n_queries), np.float32),
        "targets": np.stack(
            [r.randint(0, shape.n_frames // 2, (B, shape.n_queries)),
             r.randint(shape.n_frames // 2, shape.n_frames - 1,
                       (B, shape.n_queries))],
            -1).astype(np.int32),
    }


def tv_vsm_batch(videos, shape: BatchShape, packed: bool, seed: int = 0):
    """VSM batch holding ``videos`` (occupancy.VideoShape list) in the
    unpacked (one sub per row) or packed (first-fit, segment ids) layout.
    Returns (batch dict, fraction of subs dropped).  The unpacked branch
    clamps each kept sub to (txt_len, frames_per_sub) without counting
    the clipped tokens — see the layout note above."""
    r = np.random.RandomState(seed)
    B, S, Lt, Fs = (len(videos), shape.n_subs, shape.txt_len,
                    shape.frames_per_sub)
    out = _tv_common(r, B, shape)
    out.update({
        "sub_input_ids": np.ones((B, S, Lt), np.int32),
        "sub_txt_mask": np.zeros((B, S, Lt), np.float32),
        "sub_frame_idx": np.zeros((B, S, Fs), np.int32),
        "sub_frame_mask": np.zeros((B, S, Fs), np.float32),
        "sub_mask": np.zeros((B, S), np.float32),
    })
    if packed:
        out.update({
            "sub_txt_seg": np.full((B, S, Lt), -1, np.int32),
            "sub_frame_seg": np.full((B, S, Fs), -1, np.int32),
            "sub_txt_pos": np.zeros((B, S, Lt), np.int32),
            "sub_frame_pos": np.zeros((B, S, Fs), np.int32),
        })
    dropped = total = 0
    for b, v in enumerate(videos):
        out["c_attn_masks"][b, :v.n_frames] = 1.0
        lens = list(zip(v.sub_txt_lens, v.sub_n_frames))
        total += len(lens)
        f0 = 0
        if packed:
            from hero_tpu.data.packing import pack_subs
            pls = pack_subs(lens, S, Lt, Fs)
            for (tl, fl), pl in zip(lens, pls):
                if pl is None:
                    dropped += 1
                    continue
                t0, t1 = pl.toff, pl.toff + pl.tlen
                out["sub_input_ids"][b, pl.row, t0:t1] = 5
                out["sub_txt_mask"][b, pl.row, t0:t1] = 1.0
                out["sub_txt_seg"][b, pl.row, t0:t1] = pl.seg
                out["sub_txt_pos"][b, pl.row, t0:t1] = np.arange(pl.tlen)
                if pl.flen:
                    q0, q1 = pl.foff, pl.foff + pl.flen
                    idx = (f0 + np.arange(pl.flen)) % v.n_frames
                    out["sub_frame_idx"][b, pl.row, q0:q1] = idx
                    out["sub_frame_mask"][b, pl.row, q0:q1] = 1.0
                    out["sub_frame_seg"][b, pl.row, q0:q1] = pl.seg
                    out["sub_frame_pos"][b, pl.row, q0:q1] = \
                        np.arange(pl.flen)
                    f0 += pl.flen
                out["sub_mask"][b, pl.row] = 1.0
        else:
            dropped += max(0, len(lens) - S)
            for s, (tl, fl) in enumerate(lens[:S]):
                tl, fl = min(tl, Lt), min(fl, Fs)
                out["sub_input_ids"][b, s, :tl] = 5
                out["sub_txt_mask"][b, s, :tl] = 1.0
                idx = (f0 + np.arange(fl)) % v.n_frames
                out["sub_frame_idx"][b, s, :fl] = idx
                out["sub_frame_mask"][b, s, :fl] = 1.0
                out["sub_mask"][b, s] = 1.0
                f0 += fl
    return out, dropped / max(total, 1)


def tv_task_batch(task: str, videos, shape: BatchShape, packed: bool,
                  seed: int = 0, max_masked: Optional[int] = None):
    """TV-distribution batch for any pretraining task, packed or
    unpacked (tools/recipe_bench.py): the sub layout comes from
    :func:`tv_vsm_batch` (same content in either layout), task extras
    mirror the per-task batch builders above.

    ``max_masked``: MLM slot cap per ROW — defaults to
    ``mlm_row_cap(0.15, txt_len)``, which auto-scales with the packed
    row's larger text budget.  Returns (batch, subs_dropped_frac).
    """
    b, dropped = tv_vsm_batch(videos, shape, packed, seed)
    r = np.random.RandomState(seed + 7)
    B, S, Lt, F = len(videos), shape.n_subs, shape.txt_len, shape.n_frames
    if task == "vsm":
        return b, dropped
    if task.startswith("mlm"):
        if max_masked is None:
            from hero_tpu.data.pretrain_tasks import mlm_row_cap
            max_masked = mlm_row_cap(0.15, Lt)
        M = max_masked
        mask_pos = np.zeros((B, S, M), np.int32)
        labels = np.full((B, S, M), -1, np.int32)
        for bi in range(B):
            for si in range(S):
                valid = np.where(b["sub_txt_mask"][bi, si] > 0)[0]
                if not len(valid):
                    continue
                k = min(M, max(1, int(len(valid) * 0.15)))
                picks = r.choice(valid, k, replace=False)
                mask_pos[bi, si, :k] = picks
                labels[bi, si, :k] = r.randint(3, shape.vocab_size, k)
                b["sub_input_ids"][bi, si, picks] = 3  # [MASK]
        b["mlm_mask_pos"] = mask_pos
        b["mlm_labels"] = labels
    elif task in ("mfm-nce", "mffr"):
        m = (r.rand(B, F) < 0.15).astype(np.float32) * b["c_attn_masks"]
        m[:, 0] = b["c_attn_masks"][:, 0]   # >=1 masked frame per video
        b["c_v_masks"] = m
    elif task == "fom":
        orders = np.tile(np.arange(F, dtype=np.int32), (B, 1))
        targets = np.full((B, F), -1, np.int32)
        for bi in range(B):
            nf = int(b["c_attn_masks"][bi].sum())
            sel = r.choice(nf, max(1, int(nf * 0.15)), replace=False)
            perm = r.permutation(sel)
            orders[bi, sel] = perm
            targets[bi, perm] = sel.astype(np.int32)
        b["shuffled_orders"] = orders
        b["fom_targets"] = targets
    else:
        raise ValueError(task)
    return b, dropped
