#!/usr/bin/env python
"""Flagship-scale end-to-end drive on the REAL TPU (VERDICT r2 #1).

Runs the full product at the FLAGSHIP model size (hidden 768, 6-layer
cross-modal + 3-layer temporal + 2-layer decoder, 12 heads, vocab 50272,
4352-d frame features — reference config/hero_tvc.json / pretrain-tv) on
a synthetic CORRELATED corpus, exercising every compute path that only
ever ran at toy size before: pretrain (VSM+MLM mix) → train_vcmr →
full two-phase corpus eval → TVC train + greedy AND beam decode →
VideoQA train+eval → VIOLIN train+eval (every task head at flagship
scale on the real chip).

The corpus carries a learnable retrieval signal (per-video feature
direction + identity tokens, data/testing.py correlated=True), so the
drive ASSERTS the learning signal at flagship scale: corpus VR R@1 after
finetuning must be >= 10x chance (32 videos -> chance ~3%).

This is the strongest available substitute for the unmeasurable
hero-tv-ht100.pt parity target (BASELINE.md:27-28): real TVR data and
the reference checkpoint are not in this environment, so we prove the
*system* end-to-end — the eval einsums, the scan decode, and beam search
compile and run correctly on real TPU at flagship shapes (where
Mosaic/bf16 lowering bugs live; CPU tests run interpret mode).

Run with no env overrides so the real chip is used (ONE TPU job at a
time):  timeout 5400 python tools/flagship_drive.py
"""
import faulthandler
import glob
import json
import os
import shutil
import sys
import time

# zero-egress environment: stop transformers from retrying hub downloads
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

print("T0", time.strftime("%H:%M:%S"), flush=True)
faulthandler.dump_traceback_later(600, repeat=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

root = os.environ.get("DRIVE_ROOT", "/tmp/flagship_drive")
shutil.rmtree(root, ignore_errors=True)
os.makedirs(root)

# FLAGSHIP_SMOKE=1: tiny dims for a fast CPU wiring check of this script
# (the real drive runs flagship dims on the real chip)
SMOKE = bool(int(os.environ.get("FLAGSHIP_SMOKE", "0")))
if SMOKE:
    # the env-var route (JAX_PLATFORMS=cpu) is overridden by the axon
    # sitecustomize; steer in-process before any backend initializes
    import jax
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8").strip()
    jax.config.update("jax_platforms", "cpu")
# FLAGSHIP_PACK=1: run ALL phases (pretrain, train_vcmr, corpus eval,
# TVC, VideoQA, VIOLIN) in the production --pack_subs layout — the
# flagship-scale proof that packed training carries the same learning
# signal.  QA/VIOLIN replicate their question/statement tokens into each
# packed segment (video.video_item append_ids).
PACK = bool(int(os.environ.get("FLAGSHIP_PACK", "0")))
PACK_ARGS = ["--pack_subs"] if PACK else []

N_VIDEOS, MAX_FRAMES, VDIM = (8, 16, 64) if SMOKE else (32, 32, 4352)
HID, HEADS, INTER, NL_F, NL_C = ((32, 4, 64, 2, 1) if SMOKE
                                 else (768, 12, 3072, 6, 3))
VOCAB = 128 if SMOKE else 50272

from hero_tpu.data.testing import build_synthetic_corpus

corpus = build_synthetic_corpus(root, n_videos=N_VIDEOS,
                                max_frames=MAX_FRAMES, vfeat_dim=VDIM,
                                n_queries_per_video=2, correlated=True)
print(time.strftime("%H:%M:%S"),
      f"[OK] correlated corpus: {N_VIDEOS} videos x <= {MAX_FRAMES} frames"
      f" x {VDIM}-d", flush=True)

# flagship dims (reference config/hero_tvc.json: 6L f / 3L c / 2L d,
# hidden 768, vocab 50272)
base_trm = {"hidden_size": HID, "num_hidden_layers": NL_F,
            "num_attention_heads": HEADS, "intermediate_size": INTER,
            "max_position_embeddings": 514, "vocab_size": VOCAB,
            "type_vocab_size": 2}
model_cfg = {
    "f_config": base_trm,
    "c_config": dict(base_trm, num_hidden_layers=NL_C),
    "q_config": dict(base_trm, num_hidden_layers=0, type_vocab_size=1),
    "d_config": dict(base_trm, num_hidden_layers=min(2, NL_F),
                     type_vocab_size=1, max_position_embeddings=1024),
}
mc = os.path.join(root, "model.json")
json.dump(model_cfg, open(mc, "w"))

base = dict(
    sub_txt_db=corpus["sub"], vfeat_db=corpus["vfeat"], model_config=mc,
    max_clip_len=MAX_FRAMES, max_txt_len=20, vfeat_interval=1.5,
    vfeat_dim=VDIM, train_batch_size=8, gradient_accumulation_steps=1,
    learning_rate=1e-4, grad_norm=2.0, sub_ctx_len=1, seed=11,
    bucket_n_subs=4, bucket_frames_per_sub=16, bucket_query_len=12,
    bucket_max_masked=6, query_per_video=2,
    lw_neg_q=8.0, lw_neg_ctx=8.0, lw_st_ed=0.02, drop_svmr_prob=0.8,
    hard_pool_size=[16], hard_neg_weights=[10],
    hard_negtiave_start_step=[40], train_span_start_step=0,
)


def write_cfg(name, d):
    p = os.path.join(root, name)
    json.dump(d, open(p, "w"))
    return p


from hero_tpu.config import opts as opts_lib
from hero_tpu.drivers import pretrain as dp

timings = {}

# ---- phase 1: pretrain, VSM+MLM mixture --------------------------------
out1 = os.path.join(root, "pre")
n_pre = 8 if SMOKE else 120
cfg1 = write_cfg("pre.json", dict(
    base, output_dir=out1, num_train_steps=n_pre, warmup_steps=10,
    valid_steps=10_000, save_steps=n_pre,
    task_ratios={"vsm": 2, "mlm": 1}))
t0 = time.time()
dp.main(opts_lib.get_pretrain_args(["--config", cfg1] + PACK_ARGS))
timings["pretrain_s"] = round(time.time() - t0, 1)
ckpts = sorted(glob.glob(os.path.join(out1, "ckpt", "model_step_*.npz")))
assert ckpts, "no pretrain ckpt"
print(time.strftime("%H:%M:%S"),
      f"[OK] flagship pretrain {n_pre} steps (vsm+mlm) in "
      f"{timings['pretrain_s']}s -> {os.path.basename(ckpts[-1])}",
      flush=True)

# ---- phase 2: train_vcmr from the pretrain ckpt ------------------------
out2 = os.path.join(root, "vcmr")
n_ft = 10 if SMOKE else 150
cfg2 = write_cfg("vcmr.json", dict(
    base, task="tvr", output_dir=out2, checkpoint=ckpts[-1],
    train_query_txt_db=corpus["query"], val_query_txt_db=corpus["query"],
    num_train_steps=n_ft, warmup_steps=10, valid_steps=10_000,
    save_steps=n_ft, learning_rate=2e-4, drop_svmr_prob=0.0,
    max_vcmr_video=10, max_before_nms=100, max_after_nms=20, nms_thd=0.5,
    min_pred_l=1, max_pred_l=16, vcmr_eval_video_batch_size=8,
    vcmr_eval_batch_size=16))
from hero_tpu.drivers import train_vcmr as dv

t0 = time.time()
dv.main(opts_lib.get_vcmr_args(["--config", cfg2] + PACK_ARGS))
timings["train_vcmr_s"] = round(time.time() - t0, 1)
print(time.strftime("%H:%M:%S"),
      f"[OK] flagship train_vcmr {n_ft} steps in "
      f"{timings['train_vcmr_s']}s", flush=True)

# ---- phase 3: standalone two-phase corpus eval + learning signal -------
from hero_tpu.drivers import eval_vcmr as de

t0 = time.time()
args = de.build_argparser().parse_args(
    ["--output_dir", out2, "--checkpoint", str(n_ft)])
metrics, submission = de.main(args)
timings["eval_vcmr_s"] = round(time.time() - t0, 1)
n_q = len(submission.get("VR", submission.get("VCMR", [])))
timings["eval_queries_per_s"] = round(n_q / timings["eval_vcmr_s"], 2)
vr_r1 = float(metrics["VR"]["r1"])        # percent
vcmr_r1 = float(metrics["VCMR"]["0.5-r1"]) if "VCMR" in metrics else None
chance = 100.0 / N_VIDEOS
print(time.strftime("%H:%M:%S"),
      f"[OK] corpus eval in {timings['eval_vcmr_s']}s: VR R@1={vr_r1:.1f}%"
      f" (chance {chance:.1f}%), VCMR 0.5-R@1={vcmr_r1}", flush=True)
if not SMOKE:   # smoke runs too few steps to learn; wiring check only
    assert vr_r1 >= 10 * chance, (
        f"learning signal too weak at flagship scale: VR R@1 {vr_r1:.1f}%"
        f" < 10x chance ({10 * chance:.1f}%)")

# ---- phase 4: TVC train + greedy AND beam decode -----------------------
out3 = os.path.join(root, "tvc")
n_tvc = 4 if SMOKE else 20
cfg3 = write_cfg("tvc.json", dict(
    base, task="tvc", output_dir=out3, checkpoint=ckpts[-1],
    cap_db=corpus["cap"], lsr=0.1, max_gen_step=12,
    num_train_steps=n_tvc, warmup_steps=4, valid_steps=10_000,
    save_steps=n_tvc))
from hero_tpu.drivers import inf_tvc
from hero_tpu.drivers import train_tvc as dt

t0 = time.time()
dt.main(opts_lib.get_tvc_args(["--config", cfg3] + PACK_ARGS))
timings["train_tvc_s"] = round(time.time() - t0, 1)
print(time.strftime("%H:%M:%S"),
      f"[OK] flagship train_tvc 20 steps in {timings['train_tvc_s']}s",
      flush=True)

for beam, name in ((1, "greedy"), (3, "beam3")):
    sub_path = os.path.join(root, f"tvc_sub_{name}.jsonl")
    t0 = time.time()
    a = inf_tvc.build_argparser().parse_args(
        ["--output_dir", out3, "--checkpoint", str(n_tvc),
         "--submission", sub_path, "--beam", str(beam)])
    inf_tvc.main(a)
    timings[f"tvc_{name}_s"] = round(time.time() - t0, 1)
    rows = [json.loads(l) for l in open(sub_path)]
    assert rows and all("descs" in r and r["descs"][0]["desc"] is not None
                        for r in rows), name
    print(time.strftime("%H:%M:%S"),
          f"[OK] inf_tvc {name}: {len(rows)} clips in "
          f"{timings[f'tvc_{name}_s']}s", flush=True)

# ---- phase 5: VideoQA train + eval at flagship scale -------------------
out4 = os.path.join(root, "qa")
n_qa = 4 if SMOKE else 12
cfg4 = write_cfg("qa.json", dict(
    base, task="tvqa", output_dir=out4, checkpoint=ckpts[-1],
    train_query_txt_db=corpus["qa_query"],
    val_query_txt_db=corpus["qa_query"], num_answers=3, lw_st_ed=0.4,
    num_train_steps=n_qa, warmup_steps=2, valid_steps=10_000,
    save_steps=n_qa))
from hero_tpu.drivers import eval_videoqa
from hero_tpu.drivers import train_videoqa as dq

t0 = time.time()
dq.main(opts_lib.get_videoqa_args(["--config", cfg4] + PACK_ARGS))
a = eval_videoqa.build_argparser().parse_args(
    ["--output_dir", out4, "--checkpoint", str(n_qa)])
qa_log, _ = eval_videoqa.main(a)
timings["videoqa_s"] = round(time.time() - t0, 1)
assert qa_log["n_ex"] > 0 and 0.0 <= qa_log["acc"] <= 1.0, qa_log
print(time.strftime("%H:%M:%S"),
      f"[OK] flagship videoqa {n_qa} steps + eval in "
      f"{timings['videoqa_s']}s: acc={qa_log['acc']:.3f} "
      f"({qa_log['n_ex']} ex)", flush=True)

# ---- phase 6: VIOLIN train + eval at flagship scale ---------------------
out5 = os.path.join(root, "violin")
n_vl = 4 if SMOKE else 12
cfg5 = write_cfg("violin.json", dict(
    base, task="violin", output_dir=out5, checkpoint=ckpts[-1],
    train_query_txt_db=corpus["violin_query"],
    val_query_txt_db=corpus["violin_query"],
    num_train_steps=n_vl, warmup_steps=2, valid_steps=10_000,
    save_steps=n_vl))
from hero_tpu.drivers import eval_violin
from hero_tpu.drivers import train_violin as dl

t0 = time.time()
dl.main(opts_lib.get_violin_args(["--config", cfg5] + PACK_ARGS))
a = eval_violin.build_argparser().parse_args(
    ["--output_dir", out5, "--checkpoint", str(n_vl)])
vl_log, _ = eval_violin.main(a)
timings["violin_s"] = round(time.time() - t0, 1)
assert vl_log["n_ex"] > 0 and 0.0 <= vl_log["acc"] <= 1.0, vl_log
print(time.strftime("%H:%M:%S"),
      f"[OK] flagship violin {n_vl} steps + eval in "
      f"{timings['violin_s']}s: acc={vl_log['acc']:.3f} "
      f"({vl_log['n_ex']} ex)", flush=True)

timings["pretrain_steps_per_s"] = round(
    n_pre / timings["pretrain_s"], 3)
summary = dict(timings, vr_r1_pct=vr_r1, vcmr_r1_pct=vcmr_r1,
               chance_pct=round(chance, 2), n_videos=N_VIDEOS,
               videoqa_acc=qa_log["acc"], violin_acc=vl_log["acc"],
               layout="packed (all phases)" if PACK else "unpacked")
print("FLAGSHIP DRIVE PASSED", json.dumps(summary), flush=True)
with open(os.path.join(root, "summary.json"), "w") as f:
    json.dump(summary, f, indent=2)
