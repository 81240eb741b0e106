"""Full-corpus VCMR / SVMR / VR evaluation — the serve path.

Re-design of reference ``eval_vcmr.py:143-515`` (and ``eval_vr.py``):

- **Phase 1** embeds every video through the backbone into a corpus tensor
  ``(Nv, max_clip_len, D)`` (kept on device, bf16-capable).
- **Phase 2** scores query batches against the whole corpus: softmax span
  probabilities, ``exp(q2c_alpha·score)`` sharpening, per-query top
  ``max_vcmr_video`` videos, the outer-product span-score cube with the
  min/max-length band mask, and the flat top-``max_before_nms`` sort — all
  fused in ONE jit per query batch (the reference interleaves GPU ops with
  host numpy; here only the final top-k indices/scores cross to host).
- Host side decodes ``unravel_index`` → (video, st, ed) seconds, builds the
  reference-schema submission JSON, applies optional temporal NMS, and
  aggregates metrics with per-rank example weighting.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hero_tpu.config.model_config import HeroConfig
from hero_tpu.const import VCMR_IOU_THDS
from hero_tpu.evaluation import tvr_metrics
from hero_tpu.models import pretrain as pretrain_lib
from hero_tpu.models import vcmr as vcmr_lib
from hero_tpu.models.pretrain import VsmConfig
from hero_tpu.utils.misc import params_to_device


# band-tile width for the chunked exact top-k in _make_ranker; 32 lanes
# measured fastest on v5e (16/64/128 within 5-40% slower at TVR shapes)
_RANK_CHUNK = 32


@dataclasses.dataclass(frozen=True)
class VcmrEvalOpts:
    """Inference options (reference train-tvr-8gpu.json / eval_vcmr flags)."""
    q2c_alpha: float = 20.0
    max_vcmr_video: int = 100
    min_pred_l: int = 2
    max_pred_l: int = 16
    max_before_nms: int = 200
    max_after_nms: int = 100
    nms_thd: float = -1.0
    vfeat_interval: float = 1.5
    max_clip_len: int = 100
    full_eval_tasks: Tuple[str, ...] = ("VCMR", "SVMR", "VR")
    eval_with_query_type: bool = True
    # >0: score the corpus in chunks of this many videos instead of
    # keeping the full (Nv, L, D) tensor resident in HBM — exact (see
    # validate_full_vcmr); the HBM ceiling becomes
    # corpus_chunk_videos · max_clip_len · D · 2 bytes (+ model)
    corpus_chunk_videos: int = 0
    # pack several ~15-BPE queries per encoder row (phase 2a) behind the
    # block-diagonal segment mask — exact (only the layout changes; every
    # query lands exactly once, data/packing.py pack_queries); halves the
    # query-encoder work vs the reference's one-row-per-query layout
    pack_queries: bool = False
    query_pack_segs: int = 4
    query_pack_rows_per_call: int = 64


def embed_video_corpus(params, cfg: HeroConfig,
                       video_batches: Iterable[Dict[str, np.ndarray]],
                       max_clip_len: int, dtype=jnp.bfloat16,
                       mesh=None) -> Tuple[jax.Array, jax.Array]:
    """Phase 1: (Nv, max_clip_len, D) frame embeddings + masks.

    With ``mesh`` (an in-process device mesh), the corpus is sharded over
    the ``data`` axis — on a multi-chip host each chip holds Nv/n_dev
    videos and phase 2's contractions/top-k run sharded, with XLA
    inserting the cross-chip gathers for the selected videos (SURVEY §7
    hard part: "shard the corpus over devices").  Nv is padded to a
    device multiple with zero-mask rows, which score -1e4 and never enter
    the top-k."""
    # params as a jit argument (not a closure constant — see phase 2)
    encode = jax.jit(lambda p, b: (
        vcmr_lib.encode_video_corpus(p, cfg, b, dtype=dtype),
        b["c_attn_masks"]))
    embs, masks = [], []
    for batch in video_batches:
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        e, m = encode(params, jb)
        embs.append(e)
        masks.append(m)
    frame_embs = jnp.concatenate(embs, 0)
    frame_masks = jnp.concatenate(masks, 0)
    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        n_dev = mesh.devices.size
        nv = frame_embs.shape[0]
        pad = (-nv) % n_dev
        if pad:
            frame_embs = jnp.pad(frame_embs,
                                 ((0, pad), (0, 0), (0, 0)))
            frame_masks = jnp.pad(frame_masks, ((0, pad), (0, 0)))
        frame_embs = jax.device_put(
            frame_embs, NamedSharding(mesh, P("data", None, None)))
        frame_masks = jax.device_put(
            frame_masks, NamedSharding(mesh, P("data", None)))
    return frame_embs, frame_masks


@functools.partial(jax.jit, static_argnames=("cfg", "max_segs", "dtype"))
def _packed_query_encode(params, ids, seg, pos, cfg, max_segs, dtype):
    # module-level jit (configs are frozen/hashable) so repeated
    # encode_queries_packed calls reuse ONE compiled program per shape
    return pretrain_lib.encode_query_packed(params, cfg, ids, seg, pos,
                                            max_segs, dtype=dtype)


def pack_query_arrays(q_ids: np.ndarray, q_lens: np.ndarray,
                      max_segs: int = 4, rows_per_call: int = 64
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                 np.ndarray]:
    """Host half of phase 2a: pack the whole query set (best-fit-
    decreasing, never drops) into rows of ``q_ids.shape[1]`` slots, the
    row count padded to a ``rows_per_call`` multiple.  Returns
    (p_ids, p_seg, p_pos, gather) where ``gather[qi]`` is the flat
    (row·max_segs + seg) slot of query ``qi``'s pooled vector."""
    from hero_tpu.data.packing import pack_queries
    nq, row_len = q_ids.shape
    # zero-mask pad queries (tail batches padded to the fixed batch size)
    # still need a slot: pack them as length-1 garbage, sliced off later
    lens = np.maximum(np.asarray(q_lens, np.int64), 1)
    pls, n_rows = pack_queries([int(x) for x in lens], row_len, max_segs)
    R = -(-n_rows // rows_per_call) * rows_per_call
    p_ids = np.zeros((R, row_len), np.int32)
    p_seg = np.full((R, row_len), -1, np.int32)
    p_pos = np.zeros((R, row_len), np.int32)
    gather = np.zeros((nq,), np.int32)
    for qi, pl in enumerate(pls):
        p_ids[pl.row, pl.toff:pl.toff + pl.tlen] = q_ids[qi, :pl.tlen]
        p_seg[pl.row, pl.toff:pl.toff + pl.tlen] = pl.seg
        p_pos[pl.row, pl.toff:pl.toff + pl.tlen] = np.arange(pl.tlen)
        gather[qi] = pl.row * max_segs + pl.seg
    return p_ids, p_seg, p_pos, gather


def encode_packed_rows(params, cfg: HeroConfig, p_ids, p_seg, p_pos,
                       gather, max_segs: int, rows_per_call: int,
                       dtype=jnp.bfloat16) -> jax.Array:
    """Device half of phase 2a: run the packed query encoder over fixed
    ``rows_per_call`` row-batches (one compile) and gather the
    per-segment pooled vectors back into query order → (Nq, D)."""
    R = p_ids.shape[0]
    outs = []
    for s in range(0, R, rows_per_call):
        e = s + rows_per_call
        out = _packed_query_encode(params, p_ids[s:e], p_seg[s:e],
                                   p_pos[s:e], cfg, max_segs, dtype)
        outs.append(out.reshape(rows_per_call * max_segs, -1))
    mod_all = jnp.concatenate(outs, 0) if len(outs) > 1 else outs[0]
    return jnp.take(mod_all, gather, axis=0)                   # (Nq, D)


def encode_queries_packed(params, cfg: HeroConfig,
                          q_ids: np.ndarray, q_lens: np.ndarray,
                          max_segs: int = 4, rows_per_call: int = 64,
                          dtype=jnp.bfloat16) -> jax.Array:
    """Phase 2a: encode ALL queries packed → (Nq, D) device matrix.

    Host packing (:func:`pack_query_arrays`) + device encode
    (:func:`encode_packed_rows`).  Exact vs per-row encoding — only the
    layout changes (the reference encodes one padded row per query,
    eval_vcmr.py:209-247)."""
    p_ids, p_seg, p_pos, gather = pack_query_arrays(
        q_ids, q_lens, max_segs, rows_per_call)
    return encode_packed_rows(params, cfg, jnp.asarray(p_ids),
                              jnp.asarray(p_seg), jnp.asarray(p_pos),
                              jnp.asarray(gather), max_segs,
                              rows_per_call, dtype)


def _check_ranking_weights(vsm: VsmConfig):
    if vsm.lw_neg_ctx == 0 and vsm.lw_neg_q == 0:
        # mirror the reference's gating (model/vcmr.py:37-56 computes
        # video-level scores only when a ranking weight is set) but fail
        # with a diagnosable error instead of a NoneType crash inside jit
        raise ValueError(
            "VCMR corpus eval needs video-level ranking scores, but "
            "lw_neg_ctx == lw_neg_q == 0 disables the ranking head. "
            "Check that the eval config (or the train-time hps.json the "
            "eval driver reloads) carries the VSM loss weights.")


def _make_ranker(opts: VcmrEvalOpts, n_videos: int, n_rows_total: int,
                 L: int):
    """The post-encoder phase-2 core shared by every scorer flavor:
    sharpen → top-``max_v`` videos → selected/GT st/ed convs + masking +
    span softmaxes → in-band span scores → chunked exact top-k.

    Convs, masking, and softmaxes run AFTER video selection: all three
    are row-local over L, so conv(gather(sim)) == gather(conv(sim)) and
    softmax(gather(st)) == gather(softmax(st)) exactly — ~Nv/max_v
    times less conv/softmax work, and only the small selected/GT
    tensors ever leave the device (the dense (Nq, Nv, L) logit and
    probability cubes stay unmaterialized; the reference materializes +
    ships them, eval_vcmr.py:237-259)."""
    max_v = min(opts.max_vcmr_video, n_videos)
    # the min/max-span band keeps only ~(max_l-min_l+1) of L diagonals of
    # the (L, L) span matrix — enumerate its positions host-side and score
    # ONLY those, instead of materializing + top-k'ing the dense masked
    # (Nq, max_v, L, L) cube (~7x less top-k work at the TVR band)
    band = tvr_metrics.generate_min_max_length_mask(
        (1, 1, L, L), opts.min_pred_l, opts.max_pred_l)[0, 0]
    band_pos = np.flatnonzero(band.reshape(-1)).astype(np.int32)
    n_band = int(band_pos.shape[0])
    # chunked exact top-k (round 5): ``lax.top_k`` lowers to a bitonic
    # sort on TPU whose cost is pass-bound, not bandwidth-bound — the
    # former per-video top-k1 over the (Nq, max_v, n_band) cube measured
    # 31 ms of the 108 ms serve step at TVR shapes.  Instead, tile the
    # band into ``_RANK_CHUNK``-lane chunks and select whole chunks
    # under the TOTAL order (value desc, flat position asc) — i.e.
    # lax.top_k's lowest-index-first tie semantics.  Rank chunks by
    # (chunk max desc, position of its first max asc): the true top-k
    # elements occupy <= k chunks, each holding one has chunk-max >=
    # the k-th element under that order, and because the order is total
    # (positions are unique) at most k chunks can rank at or above it —
    # so the top-k chunks provably contain every top-k element, ties
    # included, with no margin.  That shrinks the big sort to
    # (Nq, n_chunks) over chunk maxes + one small final lexicographic
    # sort of the gathered candidates; 3.3x faster at TVR serve shapes,
    # bit-identical to the dense reference path (pinned in
    # tests/test_vcmr_eval.py, incl. a tie-adversarial quantized case).
    chunk = _RANK_CHUNK
    nbp = -(-n_band // chunk) * chunk
    bp_pad = np.concatenate(
        [band_pos, np.zeros(nbp - n_band, np.int32)])
    band_st = jnp.asarray(bp_pad // L)
    band_ed = jnp.asarray(bp_pad % L)
    bp_pad = jnp.asarray(bp_pad)
    lane_valid = jnp.asarray(np.arange(nbp) < n_band)
    ncv = nbp // chunk                            # chunks per video
    k = min(opts.max_before_nms, max_v * n_band)
    K = min(k, max_v * ncv)                       # chunks to gather

    def rank(sim, scores, gt_vidx, head, fmask32):
        """sim: pre-conv (Nq, Nv, L) similarity (get_st_ed_sim); the
        st/ed convs + frame masking run on the top-``max_v`` selected
        rows and the GT rows ONLY — selection depends on ``scores``
        alone, and conv/mask/softmax are row-local over L, so this
        commutes exactly with the former conv-everything order (the
        full-corpus conv was 23.5 ms/512 queries vs 2.7 ms selected)."""
        sharp = jnp.exp(opts.q2c_alpha * scores.astype(jnp.float32))
        if n_videos < n_rows_total:
            # corpus pad rows (sharding pad / fixed-batch tail pad): force
            # strictly below every real exp(α·s) > 0 so top-k (≤ n_videos
            # entries) can never select one
            valid_v = jnp.arange(n_rows_total) < n_videos
            sharp = jnp.where(valid_v[None, :], sharp, -1.0)
        top_scores, top_idx = jax.lax.top_k(sharp, max_v)   # (Nq, max_v)
        sim_sel = jnp.take_along_axis(sim, top_idx[..., None], axis=1)
        fm_sel = jnp.take(fmask32, top_idx, axis=0)     # (Nq, max_v, L)
        st_sel, ed_sel = pretrain_lib.conv_st_ed_masked(head, sim_sel,
                                                        fm_sel)
        st_sel = jax.nn.softmax(st_sel.astype(jnp.float32), -1)
        ed_sel = jax.nn.softmax(ed_sel.astype(jnp.float32), -1)
        # SVMR ground-truth rows, gathered on device (host slicing of the
        # full cube would force a (Nq, Nv, L) device→host fetch per batch)
        gt = gt_vidx[:, None, None]
        sim_gt = jnp.take_along_axis(sim, gt, axis=1)[:, 0]
        fm_gt = jnp.take(fmask32, gt_vidx, axis=0)          # (Nq, L)
        st_gt, ed_gt = pretrain_lib.conv_st_ed_masked(head, sim_gt, fm_gt)
        st_gt = jax.nn.softmax(st_gt.astype(jnp.float32), -1)
        ed_gt = jax.nn.softmax(ed_gt.astype(jnp.float32), -1)
        nq = sim.shape[0]
        # in-band (st, ed) pair scores, materialized once as (Nq,
        # max_v·ncv, chunk) with the video score and pad lanes folded in
        # (vals >= 0 for real lanes, pads pinned to -1)
        vals = (st_sel[..., band_st] * ed_sel[..., band_ed]
                * top_scores[..., None])
        vals = jnp.where(lane_valid[None, None, :], vals, -1.0)
        vals = vals.reshape(nq, max_v * ncv, chunk)
        cmax = vals.max(-1)                           # (Nq, n_chunks)
        # position of each chunk's first max (argmax = lowest lane among
        # ties), making the chunk ranking a total order
        cpos = (jnp.arange(0, max_v * ncv * chunk, chunk, dtype=jnp.int32)
                [None, :] + jnp.argmax(vals, -1).astype(jnp.int32))
        chunk_ids = jnp.broadcast_to(
            jnp.arange(max_v * ncv, dtype=jnp.int32)[None, :], cmax.shape)
        _, _, cidx = jax.lax.sort((-cmax, cpos, chunk_ids),
                                  dimension=-1, num_keys=2)
        cidx = cidx[:, :K]                            # (Nq, K) chunk ids
        # contiguous chunk-row gathers (data-dependent *element* gathers
        # lower to scalar loops on TPU; row gathers lower efficiently)
        cval = jnp.take_along_axis(vals, cidx[..., None], axis=1)
        # flat band-cube position of every candidate lane, by arithmetic
        okey = (cidx[..., None] * chunk
                + jnp.arange(chunk)).astype(jnp.int32)
        # exact final selection: (value desc, flat position asc) ==
        # lax.top_k tie semantics, lexicographic 2-key sort
        sneg, skey = jax.lax.sort(
            (-cval.reshape(nq, K * chunk), okey.reshape(nq, K * chunk)),
            dimension=-1, num_keys=2)
        sc2 = -sneg[:, :k]
        fb = skey[:, :k]
        # same flat (video, st·L + ed) layout the host decode expects
        flat_idx = fb // nbp * (L * L) + bp_pad[fb % nbp]
        return (st_gt, ed_gt, top_scores, top_idx, sc2, flat_idx)

    return rank, max_v


def _mod_query_sim(params, mod_query, frame_embs, frame_masks):
    """Pre-conv similarity + video scores — the ranker convs selected
    rows only (see _make_ranker)."""
    fmask32 = frame_masks.astype(jnp.float32)
    sim = pretrain_lib.get_st_ed_sim(params["head"], mod_query,
                                     frame_embs)
    scores = pretrain_lib.get_video_level_scores(mod_query, frame_embs,
                                                 fmask32)
    return sim, scores, fmask32


def make_query_scorer(params, cfg: HeroConfig, vsm: VsmConfig,
                      opts: VcmrEvalOpts, frame_embs: jax.Array,
                      frame_masks: jax.Array, dtype=jnp.bfloat16,
                      n_real_videos: Optional[int] = None,
                      mod_query_input: bool = False):
    """Phase-2 device function (jit once per query-batch shape).

    ``n_real_videos`` caps top-k below any sharding pad rows (see
    embed_video_corpus).  With ``mod_query_input`` the scorer consumes a
    precomputed (Nq, D) pooled-query matrix (phase 2a packed encoding,
    :func:`encode_queries_packed`) instead of raw token ids."""
    _check_ranking_weights(vsm)
    n_videos = (n_real_videos if n_real_videos is not None
                else frame_embs.shape[0])
    rank, max_v = _make_ranker(opts, n_videos, int(frame_embs.shape[0]),
                               int(frame_embs.shape[1]))

    # corpus tensors and params enter as jit ARGUMENTS — closing over them
    # would bake hundreds of MB of constants into the compiled program
    @functools.partial(jax.jit, static_argnames=())
    def _score(params, frame_embs, frame_masks, q_ids, q_masks, gt_vidx):
        if mod_query_input:
            mod = q_ids
        else:
            mod = pretrain_lib.encode_query(params, cfg, q_ids, q_masks,
                                            dtype=dtype)
        sim, scores, fmask32 = _mod_query_sim(params, mod, frame_embs,
                                              frame_masks)
        return rank(sim, scores, gt_vidx, params["head"], fmask32)

    def score(q_ids, q_masks, gt_vidx=None):
        if gt_vidx is None:
            gt_vidx = jnp.zeros((q_ids.shape[0],), jnp.int32)
        return _score(params, frame_embs, frame_masks, q_ids, q_masks,
                      gt_vidx)

    return score, max_v


def make_fused_packed_scorer(params, cfg: HeroConfig, vsm: VsmConfig,
                             opts: VcmrEvalOpts, frame_embs: jax.Array,
                             frame_masks: jax.Array, dtype=jnp.bfloat16,
                             n_real_videos: Optional[int] = None,
                             max_segs: int = 4):
    """Single-dispatch serving program: packed query encode (phase 2a) +
    pooled-vector gather + corpus scoring + chunked exact top-k
    (phase 2b) for a WHOLE query set in ONE compiled XLA program.

    This is the production serving configuration on TPU: one launch per
    request batch amortizes every per-op dispatch, XLA fuses the
    encode→score boundary, and only the final top-k tensors leave the
    device.  Compiles once per (rows, Nq) shape — size the query-set
    bucket accordingly (pad rows/queries; pad queries are scored as
    garbage and sliced off by the caller, exactly like the per-batch
    scorer's tail padding)."""
    _check_ranking_weights(vsm)
    n_videos = (n_real_videos if n_real_videos is not None
                else frame_embs.shape[0])
    rank, max_v = _make_ranker(opts, n_videos, int(frame_embs.shape[0]),
                               int(frame_embs.shape[1]))

    @functools.partial(jax.jit, static_argnames=())
    def _run(params, frame_embs, frame_masks, p_ids, p_seg, p_pos,
             gather, gt_vidx):
        mod = pretrain_lib.encode_query_packed(params, cfg, p_ids, p_seg,
                                               p_pos, max_segs,
                                               dtype=dtype)
        mod = jnp.take(mod.reshape(-1, mod.shape[-1]), gather, axis=0)
        sim, scores, fmask32 = _mod_query_sim(params, mod, frame_embs,
                                              frame_masks)
        return rank(sim, scores, gt_vidx, params["head"], fmask32)

    def run(p_ids, p_seg, p_pos, gather, gt_vidx=None):
        if gt_vidx is None:
            gt_vidx = jnp.zeros((gather.shape[0],), jnp.int32)
        return _run(params, frame_embs, frame_masks, p_ids, p_seg, p_pos,
                    gather, gt_vidx)

    return run, max_v


def _band_setup(opts: VcmrEvalOpts, L: int):
    band = tvr_metrics.generate_min_max_length_mask(
        (1, 1, L, L), opts.min_pred_l, opts.max_pred_l)[0, 0]
    band_pos = np.flatnonzero(band.reshape(-1)).astype(np.int32)
    return band_pos


def _chunked_score_all(params, cfg: HeroConfig, vsm: VsmConfig,
                       opts: VcmrEvalOpts,
                       video_batches, query_batches: List[Dict[str, Any]],
                       video2idx_local: Dict[str, int], n_real_videos: int,
                       dtype):
    """Chunked phase 1+2 (VERDICT r3 #5): corpora exceeding HBM.

    The corpus is embedded and scored ``corpus_chunk_videos`` videos at a
    time; per-query top-k carries over EXACTLY because every per-(query,
    video) quantity is chunk-independent — exp(α·s) sharpening is
    elementwise and the span softmaxes are rows of the per-video (L,)
    logits (softmax-after-selection commutes, see make_query_scorer) — so
    the global top-``max_vcmr_video`` is a k-way merge of per-chunk
    top-ks, and the flat top-``max_before_nms`` merges the per-video
    top-k1 band candidates of the merged videos.  Tie-breaks replicate
    ``jax.lax.top_k`` (first occurrence = lowest index).  Returns one
    (st_gt, ed_gt, top_scores, top_idx, flat_scores, flat_idx) tuple per
    query batch, bit-identical to the resident path.
    """
    Nc = int(opts.corpus_chunk_videos)
    L = opts.max_clip_len
    encode = jax.jit(lambda p, b: (
        vcmr_lib.encode_video_corpus(p, cfg, b, dtype=dtype),
        b["c_attn_masks"]))

    band_pos = _band_setup(opts, L)
    n_band = int(band_pos.shape[0])
    band_st = jnp.asarray(band_pos // L)
    band_ed = jnp.asarray(band_pos % L)
    max_v = min(opts.max_vcmr_video, n_real_videos)
    kc = min(max_v, Nc)                       # per-chunk video top-k
    k1 = min(opts.max_before_nms, n_band)     # per-video band top-k

    @jax.jit
    def score_chunk(params, chunk_embs, chunk_masks, q_ids, q_masks,
                    gt_local):
        scores, st, ed = vcmr_lib.get_pred_from_raw_query(
            params, cfg, vsm, chunk_embs, chunk_masks, q_ids, q_masks,
            cross=True, dtype=dtype)
        sharp = jnp.exp(opts.q2c_alpha * scores.astype(jnp.float32))
        top_sc, top_ix = jax.lax.top_k(sharp, kc)          # (Nq, kc)
        st_sel = jnp.take_along_axis(st, top_ix[..., None], axis=1)
        ed_sel = jnp.take_along_axis(ed, top_ix[..., None], axis=1)
        st_sel = jax.nn.softmax(st_sel.astype(jnp.float32), -1)
        ed_sel = jax.nn.softmax(ed_sel.astype(jnp.float32), -1)
        vals = (st_sel[..., band_st] * ed_sel[..., band_ed]
                * top_sc[..., None])                       # (Nq, kc, n_band)
        sc1, idx1 = jax.lax.top_k(vals, k1)                # (Nq, kc, k1)
        gt = gt_local[:, None, None]
        st_gt = jnp.take_along_axis(st, gt, axis=1)[:, 0]
        ed_gt = jnp.take_along_axis(ed, gt, axis=1)[:, 0]
        st_gt = jax.nn.softmax(st_gt.astype(jnp.float32), -1)
        ed_gt = jax.nn.softmax(ed_gt.astype(jnp.float32), -1)
        return top_sc, top_ix, sc1, idx1, st_gt, ed_gt

    # accumulate fixed-size video batches into fixed-size chunks (the last
    # chunk zero-padded) so encode + score_chunk each compile ONCE
    per_chunk: List[List[Any]] = [[] for _ in query_batches]
    chunk_embs, chunk_masks, offset = [], [], 0
    n_in_chunk = 0

    def flush_chunk(offset):
        e = jnp.concatenate(chunk_embs, 0)
        m = jnp.concatenate(chunk_masks, 0)
        if e.shape[0] < Nc:
            e = jnp.pad(e, ((0, Nc - e.shape[0]), (0, 0), (0, 0)))
            m = jnp.pad(m, ((0, Nc - m.shape[0]), (0, 0)))
        for bi, batch in enumerate(query_batches):
            vids = batch["vids"]
            n_rows = batch["query_input_ids"].shape[0]
            gt_local = np.zeros((n_rows,), np.int32)
            for qi, v in enumerate(vids):
                a = video2idx_local.get(v, 0)
                if offset <= a < offset + Nc:
                    gt_local[qi] = a - offset
            out = score_chunk(params, e, m,
                              jnp.asarray(batch["query_input_ids"]),
                              jnp.asarray(batch["query_attn_masks"]),
                              jnp.asarray(gt_local))
            per_chunk[bi].append((offset,) + tuple(map(np.asarray, out)))

    for vb in video_batches:
        jb = {k: jnp.asarray(v) for k, v in vb.items()}
        emb, msk = encode(params, jb)
        chunk_embs.append(emb)
        chunk_masks.append(msk)
        n_in_chunk += emb.shape[0]
        if n_in_chunk >= Nc:
            # batches are expected to divide the chunk evenly; oversize
            # spill would change chunk shapes (and recompile), so assert
            assert n_in_chunk == Nc, (
                "corpus_chunk_videos must be a multiple of the video "
                f"batch size (chunk {n_in_chunk} vs {Nc})")
            flush_chunk(offset)
            offset += Nc
            chunk_embs, chunk_masks, n_in_chunk = [], [], 0
    if chunk_embs:
        flush_chunk(offset)
        offset += n_in_chunk

    # host merge, per query batch
    k = min(opts.max_before_nms, max_v * n_band)
    results = []
    for bi, batch in enumerate(query_batches):
        n_rows = batch["query_input_ids"].shape[0]
        vids = batch["vids"]
        tsc = np.zeros((n_rows, max_v), np.float32)
        tidx = np.zeros((n_rows, max_v), np.int64)
        fsc = np.zeros((n_rows, k), np.float32)
        fidx = np.zeros((n_rows, k), np.int64)
        st_gt = np.zeros((n_rows, L), np.float32)
        ed_gt = np.zeros((n_rows, L), np.float32)
        chunks = per_chunk[bi]
        for qi in range(n_rows):
            # merge video-level top-k: (-score, abs index) replicates
            # lax.top_k's lowest-index tie-break over the full corpus
            cand_sc, cand_abs, cand_loc = [], [], []
            for ci, (off, c_tsc, c_tix, _, _, _, _) in enumerate(chunks):
                abs_ix = c_tix[qi].astype(np.int64) + off
                keep = abs_ix < n_real_videos     # drop chunk pad rows
                cand_sc.append(c_tsc[qi][keep])
                cand_abs.append(abs_ix[keep])
                cand_loc.append(np.stack(
                    [np.full(int(keep.sum()), ci),
                     np.flatnonzero(keep)], 1))
            sc = np.concatenate(cand_sc)
            ab = np.concatenate(cand_abs)
            loc = np.concatenate(cand_loc, 0)
            order = np.lexsort((ab, -sc))[:max_v]
            tsc[qi] = sc[order]
            tidx[qi] = ab[order]
            # flat merge: per-video top-k1 band rows of the SELECTED
            # videos, in merged-rank order (resident layout)
            rows_sc = np.empty((max_v, k1), np.float32)
            rows_band = np.empty((max_v, k1), np.int64)
            for rank, oi in enumerate(order):
                ci, local_rank = loc[oi]
                _, _, _, c_sc1, c_idx1, _, _ = chunks[ci]
                rows_sc[rank] = c_sc1[qi, local_rank]
                rows_band[rank] = c_idx1[qi, local_rank]
            flat_sc = rows_sc.reshape(-1)
            # tie order = position in the (max_v · k1) flat layout,
            # exactly lax.top_k over the resident (max_v·k1) vector
            top = np.lexsort((np.arange(flat_sc.size), -flat_sc))[:k]
            fsc[qi] = flat_sc[top]
            ranks = top // k1
            fidx[qi] = ranks * (L * L) + band_pos[rows_band.reshape(-1)[top]]
            # SVMR gt rows come from the chunk owning the gt video
            gt_abs = video2idx_local.get(vids[qi], 0) if qi < len(vids) \
                else 0
            ci = min(gt_abs // Nc, len(chunks) - 1)
            st_gt[qi] = chunks[ci][5][qi]
            ed_gt[qi] = chunks[ci][6][qi]
        results.append((st_gt, ed_gt, tsc, tidx, fsc, fidx))
    return results


def validate_full_vcmr(params, cfg: HeroConfig, vsm: VsmConfig,
                       opts: VcmrEvalOpts,
                       video_batches: Iterable[Dict[str, np.ndarray]],
                       query_batches: Iterable[Dict[str, Any]],
                       video_ids: List[str],
                       video2idx_global: Dict[str, int],
                       query_data: Dict[Any, dict],
                       dtype=jnp.bfloat16, mesh=None):
    """Run the full two-phase evaluation.

    ``query_batches`` yield dicts with numpy ``query_input_ids`` (N, Lq),
    ``query_attn_masks``, plus host lists ``qids`` and ``vids`` (GT video
    per query, "" if unknown).  Returns (val_log, submission, metrics).
    """
    # place host params once: they enter every phase as jit ARGUMENTS, so
    # leaving them as numpy would re-upload the full model per batch
    params = params_to_device(params)
    video2idx_local = {v: i for i, v in enumerate(video_ids)}
    chunked = (opts.corpus_chunk_videos
               and opts.corpus_chunk_videos < len(video_ids))
    if chunked:
        if opts.pack_queries:
            raise ValueError(
                "pack_queries is not supported together with "
                "corpus_chunk_videos (the chunked scorer re-encodes "
                "queries per chunk); drop one of the two flags")
        # corpora exceeding HBM: never materialize (Nv, L, D); score
        # chunk-by-chunk with an exact top-k merge (single-chip path)
        assert mesh is None or mesh.devices.size == 1, (
            "corpus_chunk_videos is the single-chip big-corpus path; "
            "use mesh-sharded embed_video_corpus for multi-chip")
        query_batches = list(query_batches)
        chunk_outs = _chunked_score_all(
            params, cfg, vsm, opts, video_batches, query_batches,
            video2idx_local, len(video_ids), dtype)
        max_v = min(opts.max_vcmr_video, len(video_ids))
        L = opts.max_clip_len
        scorer = None
    else:
        frame_embs, frame_masks = embed_video_corpus(
            params, cfg, video_batches, opts.max_clip_len, dtype,
            mesh=mesh)
        scorer, max_v = make_query_scorer(
            params, cfg, vsm, opts, frame_embs, frame_masks, dtype,
            n_real_videos=len(video_ids),
            mod_query_input=opts.pack_queries)
        L = int(frame_embs.shape[1])
        chunk_outs = None
        mod_all = None
        if opts.pack_queries:
            # phase 2a: encode the WHOLE query set packed (exact — every
            # query lands exactly once; see encode_queries_packed), then
            # phase 2b scores per-batch slices of the (Nq, D) matrix
            query_batches = list(query_batches)
            all_ids = np.concatenate(
                [b["query_input_ids"] for b in query_batches], axis=0)
            all_lens = np.concatenate(
                [np.asarray(b["query_attn_masks"]).sum(axis=1)
                 for b in query_batches], axis=0).astype(np.int64)
            mod_all = encode_queries_packed(
                params, cfg, all_ids, all_lens,
                max_segs=opts.query_pack_segs,
                rows_per_call=opts.query_pack_rows_per_call, dtype=dtype)

    total_qids, total_vids = [], []
    svmr_st, svmr_ed = [], []
    top_scores_all, top_idx_all = [], []
    flat_scores_all, flat_idx_all = [], []
    has_gt_target = True
    n_ex = 0
    partial_query_data = []
    for bi, batch in enumerate(query_batches):
        qids, vids = batch["qids"], batch["vids"]
        total_qids.extend(qids)
        total_vids.extend(vids)
        for qid in qids:
            if qid in query_data:
                partial_query_data.append(query_data[qid])
        n_ex += len(qids)
        if any(v == "" or v is None for v in vids):
            has_gt_target = False
        if has_gt_target:
            missing = [v for v in vids if v not in video2idx_local]
            if missing:
                # fail loudly: substituting another video's span logits as
                # SVMR ground truth would silently corrupt the metrics
                raise KeyError(
                    "ground-truth video(s) missing from the embedded "
                    f"corpus: {missing[:5]} — the eval corpus must contain "
                    "every GT video (check bucket routing / video_db "
                    "filtering)")
        # query arrays may be padded past the real query count (tail
        # batches padded to the fixed batch size so phase 2 compiles
        # exactly once — data/downstream_tasks.py batches(pad_to_full));
        # pad rows are zero-masked, scored as garbage, and sliced off here
        n_real = len(qids)
        if chunk_outs is not None:
            out = chunk_outs[bi]
        else:
            n_rows = batch["query_input_ids"].shape[0]
            gt_vidx = np.zeros((n_rows,), dtype=np.int32)
            gt_vidx[:n_real] = [video2idx_local.get(v, 0) for v in vids]
            if mod_all is not None:
                q_off = sum(b["query_input_ids"].shape[0]
                            for b in query_batches[:bi])
                out = scorer(
                    jax.lax.dynamic_slice_in_dim(mod_all, q_off, n_rows),
                    None, jnp.asarray(gt_vidx))
            else:
                out = scorer(jnp.asarray(batch["query_input_ids"]),
                             jnp.asarray(batch["query_attn_masks"]),
                             jnp.asarray(gt_vidx))
        st_gt, ed_gt, tsc, tidx, fsc, fidx = (
            np.asarray(x)[:n_real] for x in out)
        if "SVMR" in opts.full_eval_tasks and has_gt_target:
            svmr_st.append(st_gt)
            svmr_ed.append(ed_gt)
        top_scores_all.append(tsc)
        top_idx_all.append(tidx)
        flat_scores_all.append(fsc)
        flat_idx_all.append(fidx)

    sorted_q2c_scores = np.concatenate(top_scores_all, 0)
    sorted_q2c_indices = np.concatenate(top_idx_all, 0)
    flat_scores = np.concatenate(flat_scores_all, 0)
    flat_indices = np.concatenate(flat_idx_all, 0)

    svmr_res, vr_res, vcmr_res = [], [], []
    if "SVMR" in opts.full_eval_tasks and has_gt_target and svmr_st:
        st_total = np.concatenate(svmr_st, 0)
        ed_total = np.concatenate(svmr_ed, 0)
        prod = np.einsum("bm,bn->bmn", st_total, ed_total)
        prod *= tvr_metrics.generate_min_max_length_mask(
            prod.shape, opts.min_pred_l, opts.max_pred_l)
        triples = tvr_metrics.find_max_triples_from_upper_triangle_product(
            prod, top_n=opts.max_before_nms)
        for i, (qid, vid) in enumerate(zip(total_qids, total_vids)):
            t = triples[i]
            t[:, 1] += 1                       # ed index is inclusive
            t[:, :2] *= opts.vfeat_interval
            svmr_res.append(dict(
                desc_id=int(qid), desc="",
                predictions=[[video2idx_global[vid]] + row
                             for row in t.tolist()]))

    if "VR" in opts.full_eval_tasks:
        for i in range(len(total_qids)):
            preds = []
            for sc, vi in zip(sorted_q2c_scores[i, :100],
                              sorted_q2c_indices[i, :100]):
                preds.append([video2idx_global[video_ids[int(vi)]], 0, 0,
                              float(sc)])
            vr_res.append(dict(desc_id=int(total_qids[i]), desc="",
                               predictions=preds))

    if "VCMR" in opts.full_eval_tasks:
        for i in range(len(total_qids)):
            v_loc, st_i, ed_i = np.unravel_index(
                flat_indices[i], shape=(max_v, L, L))
            v_meta = sorted_q2c_indices[i, v_loc]
            st_sec = st_i.astype(np.float32) * opts.vfeat_interval
            ed_sec = (ed_i.astype(np.float32) * opts.vfeat_interval
                      + opts.vfeat_interval)
            preds = []
            for j, (vm, sc) in enumerate(zip(v_meta, flat_scores[i])):
                preds.append([video2idx_global[video_ids[int(vm)]],
                              float(st_sec[j]), float(ed_sec[j]),
                              float(sc)])
            vcmr_res.append(dict(desc_id=int(total_qids[i]), desc="",
                                 predictions=preds))

    eval_res = dict(SVMR=svmr_res, VCMR=vcmr_res, VR=vr_res)
    eval_res = {k: v for k, v in eval_res.items() if len(v) != 0}
    eval_res["video2idx"] = video2idx_global
    submission = tvr_metrics.get_submission_top_n(
        eval_res, top_n=opts.max_after_nms)

    val_log: Dict[str, float] = {}
    metrics = None
    if has_gt_target and partial_query_data:
        metrics = tvr_metrics.eval_retrieval(
            submission, partial_query_data, iou_thds=VCMR_IOU_THDS,
            match_number=True, verbose=False,
            use_desc_type=opts.eval_with_query_type)
        metrics = aggregate_distributed_metrics(metrics, n_ex)
        for task_type, task_metric in metrics.items():
            for k, v in task_metric.items():
                if k == "desc_type_ratio":
                    continue
                val_log[f"valid_{task_type}/{task_type}_{k}"] = v
        if opts.nms_thd != -1:
            # Reference quirk, reproduced deliberately: get_submission_top_n
            # aliases the entry dicts (tvr_eval_utils.py:178-190 truncates
            # e["predictions"] in place), so the reference's NMS pass
            # (eval_vcmr.py:458-475) both (a) operates on the already
            # top-max_after_nms-truncated lists and (b) mutates the
            # submission it has ALREADY built at eval_vcmr.py:420 — the
            # returned submission carries the NMS lists.  Our top_n copy is
            # non-aliasing, so we feed NMS the submission's lists directly;
            # post_processing_* mutates them in place, which matches both
            # observable behaviors (pinned by test_reference_parity_eval).
            after = dict(video2idx=submission["video2idx"])
            if "SVMR" in submission:
                after["SVMR"] = tvr_metrics.post_processing_svmr_nms(
                    submission["SVMR"], nms_thd=opts.nms_thd,
                    max_before_nms=opts.max_before_nms,
                    max_after_nms=opts.max_after_nms)
            if "VCMR" in submission:
                after["VCMR"] = tvr_metrics.post_processing_vcmr_nms(
                    submission["VCMR"], nms_thd=opts.nms_thd,
                    max_before_nms=opts.max_before_nms,
                    max_after_nms=opts.max_after_nms)
            metrics_nms = tvr_metrics.eval_retrieval(
                after, partial_query_data, iou_thds=VCMR_IOU_THDS,
                match_number=True, verbose=False,
                use_desc_type=opts.eval_with_query_type)
            metrics_nms = aggregate_distributed_metrics(metrics_nms, n_ex)
            for task_type, task_metric in metrics_nms.items():
                for k, v in task_metric.items():
                    if k == "desc_type_ratio":
                        continue
                    val_log[f"valid_{task_type}_nms_{opts.nms_thd}/"
                            f"{task_type}_{k}"] = v
    # Distributed eval: each process scored only its own query shard —
    # the RETURNED submission must carry every query (the reference
    # all-gathers query-level results before rank 0 writes,
    # eval_vcmr.py:125-140).  Metrics above are computed per-shard and
    # example-weight-merged (match_number requires GT/shard alignment),
    # so the merge happens after them.
    submission = _merge_process_submissions(submission)
    return val_log, submission, metrics


def _merge_process_submissions(submission):
    """All-gather per-shard submissions so every process holds the full
    query set (reference ``all_gather_list(results)``, eval_vcmr.py:
    125-140); identity for single process."""
    if jax.process_count() == 1:
        return submission
    from hero_tpu.parallel.mesh import host_allgather
    subs = host_allgather(submission)
    merged = {"video2idx": submission["video2idx"]}
    for task in ("SVMR", "VCMR", "VR"):
        rows = [r for s in subs for r in s.get(task, [])]
        if rows:
            merged[task] = rows
    return merged


def aggregate_distributed_metrics(metrics, n_ex: int):
    """Example-count-weighted metric averaging across host processes
    (reference eval_vcmr.py:430-448); identity for single process."""
    from hero_tpu.parallel.mesh import host_allgather
    n_per_rank = host_allgather(n_ex)
    m_per_rank = host_allgather(metrics)
    total = sum(n_per_rank)
    out: Dict[str, Dict[str, float]] = {}
    for task_type, task_metric in metrics.items():
        out[task_type] = {}
        for k in task_metric:
            if k == "desc_type_ratio":
                continue
            val = sum(n * m_per_rank[i][task_type][k]
                      for i, n in enumerate(n_per_rank)) / max(total, 1)
            out[task_type][k] = val
    return out
