#!/usr/bin/env python
"""Full-system drive on the REAL TPU (the verify skill's end-to-end step).

corpus -> pretrain (second bucket, preemption at step 4 + schedule-exact
resume) -> train_vcmr from the pretrain ckpt -> standalone eval_vcmr.
Run with no env overrides so the real chip is used:
    timeout 4800 python tools/full_drive.py
Takes ~15-25 min (first compiles dominate).  ONE TPU job at a time.
"""
import faulthandler, glob, json, os, shutil, sys, time
print("T0", time.strftime("%H:%M:%S"), flush=True)
faulthandler.dump_traceback_later(240, repeat=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

root = os.environ.get("DRIVE_ROOT", "/tmp/drive_r2")
shutil.rmtree(root, ignore_errors=True)
os.makedirs(root)
from hero_tpu.data.testing import build_synthetic_corpus
corpus = build_synthetic_corpus(root, n_videos=6, max_frames=16,
                                vfeat_dim=64)
model_cfg = {
    "f_config": {"hidden_size": 32, "num_hidden_layers": 2,
                 "num_attention_heads": 4, "intermediate_size": 64,
                 "max_position_embeddings": 64, "vocab_size": 128,
                 "type_vocab_size": 2},
    "c_config": {"hidden_size": 32, "num_hidden_layers": 1,
                 "num_attention_heads": 4, "intermediate_size": 64,
                 "max_position_embeddings": 64, "type_vocab_size": 2},
    "q_config": {"hidden_size": 32, "num_hidden_layers": 0,
                 "num_attention_heads": 4, "intermediate_size": 64,
                 "max_position_embeddings": 64, "vocab_size": 128,
                 "type_vocab_size": 1},
}
mc = os.path.join(root, "model.json")
json.dump(model_cfg, open(mc, "w"))

base = dict(
    sub_txt_db=corpus["sub"], vfeat_db=corpus["vfeat"], model_config=mc,
    max_clip_len=16, max_txt_len=12, vfeat_interval=1.5, vfeat_dim=64,
    train_batch_size=4, gradient_accumulation_steps=1, learning_rate=1e-3,
    valid_steps=1000, save_steps=4, warmup_steps=2, grad_norm=1.0,
    sub_ctx_len=1, seed=7, bucket_n_subs=2, bucket_frames_per_sub=12,
    bucket_query_len=16, second_bucket=True, query_per_video=2,
    lw_neg_q=8.0, lw_neg_ctx=8.0, lw_st_ed=0.02, drop_svmr_prob=0.5,
    hard_pool_size=[4], hard_neg_weights=[10],
    hard_negtiave_start_step=[5], train_span_start_step=0,
)

def write_cfg(name, d):
    p = os.path.join(root, name)
    json.dump(d, open(p, "w"))
    return p

from hero_tpu.config import opts as opts_lib
from hero_tpu.drivers import pretrain as dp
import hero_tpu.drivers.common as dcommon

out1 = os.path.join(root, "pre")
cfg8 = write_cfg("pre.json", dict(base, output_dir=out1,
                                  num_train_steps=8))

# phase A: emulate preemption at step 4 (hps stay num_train_steps=8, as a
# real interrupted run would have)
orig_rt = dcommon.run_training
def interrupted(opts, *a, **k):
    opts.num_train_steps = 4
    return orig_rt(opts, *a, **k)
dcommon.run_training = interrupted
try:
    dp.main(opts_lib.get_pretrain_args(["--config", cfg8]))
finally:
    dcommon.run_training = orig_rt
assert os.path.exists(os.path.join(out1, "restore.npz")), "no restore"
print(time.strftime("%H:%M:%S"), "[OK] pretrain phase A (interrupted at step 4)", flush=True)

dp.main(opts_lib.get_pretrain_args(["--config", cfg8]))
ckpts = sorted(glob.glob(os.path.join(out1, "ckpt", "model_step_*.npz")))
assert ckpts, "no ckpt"
print(f"[OK] pretrain phase B resumed -> {os.path.basename(ckpts[-1])}",
      flush=True)

from hero_tpu.training.save import checkpoint_vocab_padded
# fresh-init pretrain (no source checkpoint): the pad decision is unknown,
# so the marker is honestly omitted rather than shape-inferred
assert checkpoint_vocab_padded(ckpts[-1]) is None
print(time.strftime("%H:%M:%S"), "[OK] vocab_padded marker honest (None)", flush=True)

out2 = os.path.join(root, "vcmr")
cfgC = write_cfg("vcmr.json", dict(
    base, task="tvr", output_dir=out2, checkpoint=ckpts[-1],
    train_query_txt_db=corpus["query"], val_query_txt_db=corpus["query"],
    num_train_steps=6, valid_steps=6, gradient_accumulation_steps=2,
    max_vcmr_video=6, max_before_nms=50, max_after_nms=20, nms_thd=0.5,
    min_pred_l=1, max_pred_l=8, vcmr_eval_video_batch_size=4,
    vcmr_eval_batch_size=10, drop_svmr_prob=0.0))
from hero_tpu.drivers import train_vcmr as dv
dv.main(opts_lib.get_vcmr_args(["--config", cfgC]))
res = glob.glob(os.path.join(out2, "results_*.json"))
print(f"[OK] train_vcmr done, results: {[os.path.basename(r) for r in res]}",
      flush=True)

from hero_tpu.drivers import eval_vcmr as de
args = de.build_argparser().parse_args(
    ["--output_dir", out2, "--checkpoint", "6"])
out = de.main(args)
def _fmt(d, n=4):
    """Round a (possibly nested) metrics dict for the summary line."""
    o = {}
    for k, v in list(d.items())[:n]:
        o[k] = _fmt(v, n) if isinstance(v, dict) else round(float(v), 3)
    return o
print(time.strftime("%H:%M:%S"), "[OK] eval_vcmr standalone:",
      _fmt(out[0]) if out and out[0] else out, flush=True)
print("FULL DRIVE PASSED", flush=True)
