"""HierarchicalVlModel — the HERO backbone, TPU-native.

Re-design of reference ``model/model.py:117-345``.  The central change: the
reference's python-loop ``collect_frame_outputs`` scatter
(``model/model.py:156-187``) becomes a vectorized one-hot matmul
(:func:`collect_frame_outputs`) — an MXU-friendly segment scatter-add keyed
by the precomputed ``sub_frame_idx`` index arrays carried in the batch, and
per-sub frame features are *gathered on device* from the clip-level feature
tensor instead of being duplicated host-side.

Canonical fixed-shape batch (built by ``hero_tpu.data``):

==================  ============  =======================================
key                 shape         meaning
==================  ============  =======================================
sub_input_ids       (B, S, Lt)    subtitle BPE ids, pad = 1
sub_txt_mask        (B, S, Lt)    1 = valid text token
sub_frame_idx       (B, S, Fs)    clip-frame index per sub frame-slot
sub_frame_mask      (B, S, Fs)    1 = valid frame slot
sub_mask            (B, S)        1 = valid subtitle row
c_v_feats           (B, F, vdim)  clip-level frame features (storage
                                  fp16; cast at ingestion / loss sites)
c_attn_masks        (B, F)        1 = valid frame
==================  ============  =======================================

Task extras: ``c_v_masks`` (B, F) MFM mask; ``mlm_mask_pos``/``mlm_labels``
(B, S, M); ``shuffled_orders``/``fom_targets`` (B, F).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from hero_tpu.config.model_config import HeroConfig
from hero_tpu.models import encoder as enc
from hero_tpu.models import nn, transformer
from hero_tpu.parallel import mesh as pmesh

Params = Dict[str, Any]


def init_hierarchical_vl_model(rng, cfg: HeroConfig) -> Params:
    r1, r2, r3, r4, r5, r6 = jax.random.split(rng, 6)
    D = cfg.f_config.hidden_size
    return {
        "f_encoder": enc.init_cross_modal_trm(
            r1, cfg.f_config, cfg.vfeat_dim, cfg.max_frm_seq_len),
        "frame_transform": nn.init_linear_layer(r2, cfg.vfeat_dim, D),
        "c_encoder": enc.init_temporal_trm(r3, cfg.c_config),
        # FrameFeatureRegression: linear → gelu → LN → linear
        # (reference model/model.py:104-114)
        "feat_regress": {
            "dense_1": nn.init_linear(r4, D, D),
            "ln": nn.init_layer_norm(D),
            "dense_2": nn.init_linear(r5, D, cfg.vfeat_dim),
        },
        "mask_embedding": nn.init_embedding(
            jax.random.fold_in(r4, 1), 2, cfg.vfeat_dim, padding_idx=0),
        "fom_output": nn.init_mlp_layer(
            r6, cfg.c_config.hidden_size, cfg.max_clip_len),
    }


def feat_regress(p: Params, x: jax.Array, dtype=jnp.float32) -> jax.Array:
    h = nn.gelu(nn.linear(p["dense_1"], x, dtype))
    h = nn.apply_layer_norm(p["ln"], h)
    return nn.linear(p["dense_2"], h, dtype)


def gather_sub_frames(c_v_feats: jax.Array, sub_frame_idx: jax.Array
                      ) -> jax.Array:
    """Per-sub frame features from clip features.

    c_v_feats (B, F, vdim), sub_frame_idx (B, S, Fs) → (B, S, Fs, vdim).
    """
    B, S, Fs = sub_frame_idx.shape
    flat_idx = sub_frame_idx.reshape(B, S * Fs)
    out = jnp.take_along_axis(c_v_feats, flat_idx[..., None], axis=1)
    return out.reshape(B, S, Fs, -1)


# A/B toggle for the clip-level ImageEmbeddings projection — an exact
# rewrite that projects each unique clip frame once (F rows) instead of
# every (sub, slot) occurrence (S·Fs rows).  MEASURED SLOWER on v5e at
# the bench bucket (104.3 vs 99.7 ms/step, tools/perf_sweep.py
# base/slotproj, 2x repro) despite ~2.5x fewer projection rows: the
# one-hot re-gather einsums + masking passes cost more than the saved
# matmul rows, and XLA fuses the single big per-slot projection better.
# Kept as a tested variant — it should win when S·Fs/F grows (deeper
# sub_ctx_len overlap than the TV bucket's 2.56x).
PROJECT_CLIP_LEVEL = False


def _project_and_gather(p_img: Params, c_v_feats: jax.Array,
                        batch: Dict[str, jax.Array],
                        clip_img_masks: Optional[jax.Array] = None,
                        *, dtype=jnp.float32) -> jax.Array:
    """Clip-level ImageEmbeddings projection, then D-dim gather.

    The reference gathers 4352-d features per (sub, frame-slot) occurrence
    and projects every occurrence (model/model.py:195-224 via
    ImageEmbeddings).  mask-add/LN/linear are row-wise, so they commute
    with the gather: projecting the (B, F, vdim) clip features ONCE and
    gathering D-dim rows computes the identical values at ~S·Fs/F fewer
    projection rows (2.56x at the bench bucket) and ~vdim/D less gather
    traffic.  Padded slots (sub_frame_mask == 0) reproduce the zeroed-
    feature projection; under clip-level MFM masks they reproduce the
    zeroed-feature + mask-embedding projection of the frame they point at.

    Returns (B, S, Fs, D) projected per-sub frame inputs for
    ``cross_modal_repr(..., v_feats_projected=True)``.
    """
    from hero_tpu.models import embed
    proj = embed.project_image_features(p_img, c_v_feats,
                                        img_masks=clip_img_masks,
                                        dtype=dtype)           # (B, F, D)
    # gather as a one-hot matmul: take_along_axis on the PROJECTED tensor
    # would differentiate to a serialized scatter-add (proj carries
    # gradient, unlike the raw input features) — the one-hot contraction
    # keeps both directions on the MXU (measured +5% step time otherwise)
    B, S, Fs = batch["sub_frame_idx"].shape
    F = proj.shape[1]
    onehot = jax.nn.one_hot(batch["sub_frame_idx"].reshape(B, S * Fs), F,
                            dtype=proj.dtype)
    g = jnp.einsum("bnf,bfd->bnd", onehot, proj,
                   preferred_element_type=proj.dtype
                   ).reshape(B, S, Fs, -1)
    slot_valid = batch["sub_frame_mask"][..., None] != 0
    vdim = c_v_feats.shape[-1]
    if clip_img_masks is None:
        # padded slot == zero feature row: LN(0) -> bias -> linear
        pad_row = embed.project_image_features(
            p_img, jnp.zeros((1, 1, vdim), dtype), dtype=dtype)
        return jnp.where(slot_valid, g, pad_row)
    # padded slot == zero feature + mask_emb[bit of the pointed frame]
    pad_rows = embed.project_image_features(
        p_img, p_img["mask_emb"][None].astype(dtype),
        dtype=dtype)[0]                                        # (2, D)
    slot_bits = gather_sub_frames(clip_img_masks[..., None],
                                  batch["sub_frame_idx"])[..., 0]
    pad = jnp.take(pad_rows, slot_bits.astype(jnp.int32), axis=0)
    return jnp.where(slot_valid, g, pad)


def collect_frame_outputs(frame_hidden: jax.Array, sub_frame_idx: jax.Array,
                          valid: jax.Array, num_frames: int) -> jax.Array:
    """Scatter-add fused per-sub frame outputs onto the clip timeline.

    Vectorized equivalent of reference ``model/model.py:156-187``: for each
    valid (sub, frame-slot), ``out[b, sub_frame_idx[b,s,f]] +=
    frame_hidden[b,s,f]``.  Implemented as a one-hot matmul so it runs on
    the MXU instead of a serialized scatter.

    frame_hidden (B, S, Fs, D); sub_frame_idx/valid (B, S, Fs) → (B, F, D).
    """
    B, S, Fs, D = frame_hidden.shape
    onehot = jax.nn.one_hot(sub_frame_idx, num_frames,
                            dtype=frame_hidden.dtype)
    onehot = onehot * valid[..., None].astype(frame_hidden.dtype)
    flat_oh = onehot.reshape(B, S * Fs, num_frames)
    flat_h = frame_hidden.reshape(B, S * Fs, D)
    return jnp.einsum("bnk,bnd->bkd", flat_oh, flat_h,
                      preferred_element_type=frame_hidden.dtype)


def _flatten_subs(batch: Dict[str, jax.Array]):
    """(B, S, ...) → (B*S, ...) views of the f-level inputs."""
    B, S, Lt = batch["sub_input_ids"].shape
    Fs = batch["sub_frame_idx"].shape[2]

    def flat(x):
        return x.reshape((B * S,) + x.shape[2:])

    return B, S, Lt, Fs, flat


def _packed_extras(batch: Dict[str, jax.Array], flat):
    """Sub-packing extras for the f-encoder, or None when the batch is
    unpacked.  Presence of ``sub_txt_seg`` marks a packed batch
    (hero_tpu/data/packing.py; emitted by VideoFeatSubTokDataset with
    ``pack=True``) — rows then hold several subs, and the encoder needs
    the per-slot segment ids (block-diagonal attention) and
    per-segment-restarting position ids.  Everything else — the frame
    gather, the clip-timeline scatter, MLM's mask_pos gather — is keyed
    per slot by ``sub_frame_idx``/``mlm_mask_pos`` and works unchanged.
    """
    if "sub_txt_seg" not in batch:
        return None
    return {"txt_seg": flat(batch["sub_txt_seg"]),
            "txt_pos": flat(batch["sub_txt_pos"]),
            "frame_seg": flat(batch["sub_frame_seg"]),
            "frame_pos": flat(batch["sub_frame_pos"])}


def forward_repr(p: Params, cfg: HeroConfig, batch: Dict[str, jax.Array], *,
                 encode_clip: bool = True, f_img_masks=None,
                 c_v_feats_override=None, rng=None, train=False,
                 dtype=jnp.float32) -> jax.Array:
    """The shared hot path (reference model/model.py:195-224): stage-1 fused
    encoding per sub → scatter onto clip timeline → residual with projected
    raw features → stage-2 temporal encoding.

    Returns (B, F, D) clip-contextualized frame states (or the
    pre-c_encoder features when ``encode_clip=False``).
    """
    B, S, Lt, Fs, flat = _flatten_subs(batch)
    c_v_feats = (batch["c_v_feats"] if c_v_feats_override is None
                 else c_v_feats_override)
    F = c_v_feats.shape[1]

    if f_img_masks is None and PROJECT_CLIP_LEVEL:
        # hot path: clip-level projection + D-dim gather (exact; see
        # _project_and_gather)
        sub_v_in = flat(_project_and_gather(
            p["f_encoder"]["img_embeddings"], c_v_feats, batch,
            dtype=dtype))
        seq_out = enc.cross_modal_repr(
            p["f_encoder"], cfg.f_config,
            flat(batch["sub_input_ids"]), flat(batch["sub_txt_mask"]),
            sub_v_in, flat(batch["sub_frame_mask"]),
            v_feats_projected=True, packed=_packed_extras(batch, flat),
            rng=nn.rng_for(rng, "f_enc"), train=train, dtype=dtype)
    else:
        sub_v_feats = gather_sub_frames(c_v_feats, batch["sub_frame_idx"])
        sub_v_feats = sub_v_feats * batch["sub_frame_mask"][
            ..., None].astype(sub_v_feats.dtype)
        seq_out = enc.cross_modal_repr(
            p["f_encoder"], cfg.f_config,
            flat(batch["sub_input_ids"]), flat(batch["sub_txt_mask"]),
            flat(sub_v_feats), flat(batch["sub_frame_mask"]),
            img_masks=None if f_img_masks is None else flat(f_img_masks),
            packed=_packed_extras(batch, flat),
            rng=nn.rng_for(rng, "f_enc"), train=train, dtype=dtype)

    frame_part = seq_out[:, :Fs].reshape(B, S, Fs, -1)
    valid = (batch["sub_frame_mask"]
             * batch["sub_mask"][..., None]).astype(frame_part.dtype)
    matched = collect_frame_outputs(frame_part, batch["sub_frame_idx"],
                                    valid, F)

    transformed = nn.linear_layer(
        p["frame_transform"], c_v_feats.astype(dtype), relu=True,
        dropout_rate=cfg.f_config.hidden_dropout_prob if train else 0.0,
        rng=nn.rng_for(rng, "frame_tf"), dtype=dtype)
    transformed = transformed + matched.astype(dtype)

    if not encode_clip:
        return transformed
    # sequence parallelism (opt-in, parallel/mesh.enable_seq_parallel):
    # shard the clip-frame axis of the temporal stack over the 'seq' mesh
    # axis — LN/MLP partition cleanly, XLA inserts attention all-gathers
    transformed = pmesh.seq_constraint(transformed)
    return pmesh.seq_constraint(
        enc.temporal_trm(p["c_encoder"], cfg.c_config, transformed,
                         batch["c_attn_masks"],
                         rng=nn.rng_for(rng, "c_enc"), train=train,
                         dtype=dtype))


def forward_txt(p: Params, cfg: HeroConfig, input_ids, attn_mask, *,
                rng=None, train=False, dtype=jnp.float32) -> jax.Array:
    """Text-only path through the f_encoder ('txt' mode)."""
    return enc.cross_modal_txt(p["f_encoder"], cfg.f_config, input_ids,
                               attn_mask, rng=rng, train=train, dtype=dtype)


# ---------------------------------------------------------------------------
# MLM
# ---------------------------------------------------------------------------

def forward_mlm(p: Params, cfg: HeroConfig, batch: Dict[str, jax.Array], *,
                compute_loss: bool = True, rng=None, train=False,
                dtype=jnp.float32):
    """Masked subtitle-word prediction (reference encoder.py:355-374).

    ``mlm_mask_pos`` (B, S, M) indexes text slots; ``mlm_labels`` (B, S, M)
    holds vocab ids or -1.  Loss is per-masked-position CE (sum-normalized
    by valid count when ``compute_loss``).
    """
    B, S, Lt, Fs, flat = _flatten_subs(batch)
    sub_v_feats = gather_sub_frames(batch["c_v_feats"],
                                    batch["sub_frame_idx"])
    sub_v_feats = sub_v_feats * batch["sub_frame_mask"][..., None].astype(
        sub_v_feats.dtype)
    logits = enc.cross_modal_mlm(
        p["f_encoder"], cfg.f_config,
        flat(batch["sub_input_ids"]), flat(batch["sub_txt_mask"]),
        flat(sub_v_feats), flat(batch["sub_frame_mask"]),
        flat(batch["mlm_mask_pos"]), packed=_packed_extras(batch, flat),
        rng=nn.rng_for(rng, "f_enc"), train=train, dtype=dtype)
    labels = flat(batch["mlm_labels"])           # (N, M)
    if not compute_loss:
        return logits
    return masked_cross_entropy(logits, labels)


def streamed_lse(logits: jax.Array) -> jax.Array:
    """logsumexp over the last axis WITHOUT materializing a fp32 copy of
    the (..., vocab) logits: a whole-tensor ``astype(f32)`` (or jax's
    log_softmax) writes a 1.2 GB fp32 tensor at the flagship vocab that
    fwd+bwd then stream ~5× (measured ~9 ms of the MLM step's HBM
    traffic).  Converting per-element INSIDE the reduction fuses every
    pass over the vocab axis against the bf16 tensor; accumulation stays
    fp32, and stop_gradient on the row max keeps the backward the exact
    softmax.  Shared by :func:`masked_cross_entropy` and TVC's
    label-smoothing loss."""
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    z = jnp.sum(jnp.exp(logits.astype(jnp.float32)
                        - m.astype(jnp.float32)), axis=-1)
    return m[..., 0].astype(jnp.float32) + jnp.log(z)


def masked_cross_entropy(logits: jax.Array, labels: jax.Array,
                         ignore_index: int = -1
                         ) -> Tuple[jax.Array, jax.Array]:
    """Sum of CE over labels != ignore_index and the valid count.

    Mirrors ``F.cross_entropy(..., ignore_index=-1)`` semantics; caller
    divides sum/count for 'mean'.
    """
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    # logsumexp - picked ≡ -log_softmax[label]; see streamed_lse for why
    # the logits stay in the model dtype
    lse = streamed_lse(logits)
    picked = jnp.take_along_axis(logits, safe[..., None], axis=-1
                                 )[..., 0].astype(jnp.float32)
    nll = jnp.where(valid, lse - picked, 0.0)
    return jnp.sum(nll), jnp.sum(valid)


# ---------------------------------------------------------------------------
# MFM (masked frame modeling: regression / NCE)
# ---------------------------------------------------------------------------

def forward_mfm(p: Params, cfg: HeroConfig, batch: Dict[str, jax.Array], *,
                loss: str = "nce", compute_loss: bool = True, rng=None,
                train=False, dtype=jnp.float32, mask_prob: float = 0.15):
    """Masked frame-feature modeling (reference model/model.py:239-304).

    ``c_v_masks`` (B, F): 1 = masked frame.  Masked clip features are zeroed
    and offset by the learned mask embedding at both levels (f-level via
    ImageEmbeddings' own mask embedding, c-level via the model's), matching
    the reference's collate + forward_mfm combination.
    """
    assert loss in ("regression", "nce")
    c_mask = batch["c_v_masks"].astype(jnp.float32)      # (B, F)
    c_v_feats = batch["c_v_feats"] * (1.0 - c_mask)[..., None]
    mask_add = nn.embedding_lookup(p["mask_embedding"],
                                   c_mask.astype(jnp.int32),
                                   c_v_feats.dtype)
    c_v_feats_in = c_v_feats + mask_add
    # f-level per-sub mask flags (gathered from the clip mask)
    f_img_masks = jnp.take_along_axis(
        c_mask, batch["sub_frame_idx"].reshape(c_mask.shape[0], -1), axis=1
    ).reshape(batch["sub_frame_idx"].shape)

    # stage-1 consumes the zeroed feats (gathered from c_v_feats, NOT the
    # c-level mask-embedded version), stage-2 the mask-embedded ones
    B, S, Lt, Fs, flat = _flatten_subs(batch)
    if PROJECT_CLIP_LEVEL:
        # MFM masks derive from the clip-level c_mask, so the projection
        # can run clip-level too (exact; see _project_and_gather)
        sub_v_in = flat(_project_and_gather(
            p["f_encoder"]["img_embeddings"], c_v_feats, batch,
            clip_img_masks=c_mask, dtype=dtype))
        seq_out = enc.cross_modal_repr(
            p["f_encoder"], cfg.f_config,
            flat(batch["sub_input_ids"]), flat(batch["sub_txt_mask"]),
            sub_v_in, flat(batch["sub_frame_mask"]),
            v_feats_projected=True, packed=_packed_extras(batch, flat),
            rng=nn.rng_for(rng, "f_enc"), train=train, dtype=dtype)
    else:
        sub_v_feats = gather_sub_frames(c_v_feats, batch["sub_frame_idx"])
        sub_v_feats = sub_v_feats * batch["sub_frame_mask"][
            ..., None].astype(sub_v_feats.dtype)
        seq_out = enc.cross_modal_repr(
            p["f_encoder"], cfg.f_config,
            flat(batch["sub_input_ids"]), flat(batch["sub_txt_mask"]),
            flat(sub_v_feats), flat(batch["sub_frame_mask"]),
            img_masks=flat(f_img_masks),
            packed=_packed_extras(batch, flat),
            rng=nn.rng_for(rng, "f_enc"), train=train, dtype=dtype)
    frame_part = seq_out[:, :Fs].reshape(B, S, Fs, -1)
    valid = (batch["sub_frame_mask"]
             * batch["sub_mask"][..., None]).astype(frame_part.dtype)
    F = c_v_feats_in.shape[1]
    matched = collect_frame_outputs(frame_part, batch["sub_frame_idx"],
                                    valid, F)
    transformed = nn.linear_layer(
        p["frame_transform"], c_v_feats_in.astype(dtype), relu=True,
        dropout_rate=cfg.f_config.hidden_dropout_prob if train else 0.0,
        rng=nn.rng_for(rng, "frame_tf"), dtype=dtype)
    clip_out = enc.temporal_trm(p["c_encoder"], cfg.c_config,
                                transformed + matched.astype(dtype),
                                batch["c_attn_masks"],
                                rng=nn.rng_for(rng, "c_enc"), train=train,
                                dtype=dtype)

    pred = feat_regress(p["feat_regress"], clip_out, dtype)   # (B, F, vdim)
    if not compute_loss:
        return pred

    targets = batch["c_v_feats"].astype(jnp.float32)
    frame_valid = batch["c_attn_masks"].astype(jnp.float32)
    masked = c_mask * frame_valid
    if loss == "regression":
        err = jnp.sum(jnp.square(pred.astype(jnp.float32) - targets),
                      axis=-1)
        return jnp.sum(err * masked), jnp.sum(masked) * targets.shape[-1]
    return _mfm_nce_loss(pred, targets, masked,
                         frame_valid * (1.0 - c_mask), cfg.nce_temp,
                         mask_prob=mask_prob)


def _mfm_nce_row_cap(mask_prob: float, N: int, n_clips: int = 0) -> int:
    """Static cap on NCE rows/pos-columns, derived from the CONFIGURED
    mask probability (``--mask_prob``, default 0.15) plus a binomial tail
    margin of max(0.1 absolute, 6σ at this N), plus one forced row per
    clip — ``MfmDataset`` guarantees ≥1 masked frame per clip
    (pretrain_tasks.py), which for short clips dominates the binomial
    mean — so the cap tracks the recipe instead of assuming it (a fixed
    0.25·N silently truncated the loss for mask_prob ≳ 0.25, and a pure
    binomial model truncated short-clip datasets).  At the default
    recipe (p=0.15, B=32, F=100) this reproduces the measured 0.25·N →
    896 cap exactly.  In the astronomically unlikely overflow, extra
    masked rows are excluded from loss AND denominator (row_valid),
    never silently mis-scored."""
    import math
    margin = max(0.1, 6.0 * math.sqrt(mask_prob * (1.0 - mask_prob)
                                      / max(N, 1)))
    rows = min(N, int(min(1.0, mask_prob + margin) * N) + n_clips)
    return min(N, max((rows + 127) // 128 * 128, 128))


def _mfm_nce_loss(pred, targets, masked, unmasked, temp,
                  mask_prob: float = 0.15):
    """Contrastive MFM (reference mfm_nce, model/model.py:274-289).

    For each masked position, logits over [all masked targets ; all
    unmasked predictions]; label = own column.  The reference extracts
    masked rows dynamically (``_compute_masked_hidden``); the fixed-shape
    equivalent here gathers the masked rows to a static cap M (sized from
    the configured ``mask_prob`` — see :func:`_mfm_nce_row_cap`; ≈0.25·N
    at the default recipe) via a stable argsort on the mask, so the two
    logit matmuls are
    (M, M) + (M, N) instead of 2·(N, N) — 6.7× fewer NCE MACs at the
    bench shape, bit-identical loss (dropped columns carried -1e4 logits
    whose exp underflows to exactly 0 in fp32).

    The matmuls run in the MODEL dtype with fp32 accumulation — the
    reference computes them in apex-fp16 (model/model.py:274-289 under
    AMP O2).  Softmax/CE stay fp32.
    """
    B, F, V = pred.shape
    N = B * F
    predf = pred.reshape(N, V)
    tgtf = targets.astype(pred.dtype).reshape(N, V)
    mflat = masked.reshape(N)
    uflat = unmasked.reshape(N)
    M = _mfm_nce_row_cap(mask_prob, N, n_clips=B)
    sel = jnp.argsort(-mflat)[:M]                   # masked rows first
    row_valid = jnp.take(mflat, sel)                # (M,)
    pred_m = jnp.take(predf, sel, axis=0)           # (M, V)
    tgt_m = jnp.take(tgtf, sel, axis=0)
    pos_logits = jnp.dot(pred_m, tgt_m.T,           # (M, M) vs masked tgts
                         preferred_element_type=jnp.float32)
    neg_logits = jnp.dot(pred_m, predf.T,           # (M, N) vs unmasked preds
                         preferred_element_type=jnp.float32)
    pos_logits = nn.mask_logits(pos_logits, row_valid[None, :])
    neg_logits = nn.mask_logits(neg_logits, uflat[None, :])
    logits = jnp.concatenate([pos_logits, neg_logits], axis=1) / temp
    labels = jnp.arange(M)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    return jnp.sum(nll * row_valid), jnp.sum(row_valid)


# ---------------------------------------------------------------------------
# FOM (frame order modeling)
# ---------------------------------------------------------------------------

def forward_fom(p: Params, cfg: HeroConfig, batch: Dict[str, jax.Array], *,
                compute_loss: bool = True, rng=None, train=False,
                dtype=jnp.float32):
    """Frame-order modeling (reference model/model.py:306-336):
    scatter pre-c_encoder features into shuffled order, re-encode, and
    classify each position's original index.

    ``shuffled_orders`` (B, F): destination slot of each frame;
    ``fom_targets`` (B, F): original position or -1.
    """
    feats = forward_repr(p, cfg, batch, encode_clip=False, rng=rng,
                         train=train, dtype=dtype)          # (B, F, D)
    F = feats.shape[1]
    onehot = jax.nn.one_hot(batch["shuffled_orders"], F, dtype=feats.dtype)
    shuffled = jnp.einsum("bik,bid->bkd", onehot, feats,
                          preferred_element_type=feats.dtype)
    clip_out = enc.temporal_trm(p["c_encoder"], cfg.c_config, shuffled,
                                batch["c_attn_masks"],
                                rng=nn.rng_for(rng, "c_enc"), train=train,
                                dtype=dtype)
    logits = nn.mlp_layer(p["fom_output"], clip_out, dtype)  # (B, F, 100)
    if not compute_loss:
        return logits
    return masked_cross_entropy(logits, batch["fom_targets"])
