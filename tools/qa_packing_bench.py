"""VideoQA / VIOLIN sub-packing payoff at flagship scale.

Round-4 VERDICT (next #2) extended ``--pack_subs`` to the two most
padding-dominated tasks in the suite — TVQA materializes answer-count ×
per-sub rows (reference ``data/videoQA.py:93-115``), VIOLIN statement ×
per-sub rows (``data/violin.py:69-85``) — with packed ≡ unpacked pinned
for losses/logits/grads (tests/test_packing.py) and driver e2e tests.
This tool adds the remaining done-criterion: a MEASURED speedup.

Method mirrors ``tools/packing_bench.py`` but through the PRODUCTION
dataset path instead of synthetic arrays, because the packed QA layout
is shaped by ``video_item(append_ids=...)`` semantics (the question+
answer / statement tokens are replicated into every packed segment, so
packing placements depend on the appended length):

1. write a TV-distribution corpus (``occupancy.sample_tv_video``: 60-90 s
   clips, 13-20 dialogue subs of ~15 BPE) with TVQA-shaped questions
   (5 answers) and VIOLIN-shaped statements;
2. size both buckets from the corpus exactly like the drivers do —
   ``suggest_shapes`` / ``suggest_packed_shapes`` with the appended-text
   budget folded in (``append_len``);
3. build real ``VideoQaDataset`` / ``ViolinDataset`` batches at the
   reference recipe batch size (train-tvqa / train-violin: 4) in both
   layouts — same questions, same videos, same appended tokens;
4. time the full flagship train step (fwd+bwd+AdamW, bf16) per layout,
   median-of-N (VERDICT r4 weak #3: record every run).

Run on the real chip:   python tools/qa_packing_bench.py
Wiring smoke on CPU:    QA_BENCH_SMOKE=1 python tools/qa_packing_bench.py
Writes BENCH_QA_PACKING.json at the repo root.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SMOKE = bool(int(os.environ.get("QA_BENCH_SMOKE", "0")))
if SMOKE:
    import jax
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8").strip()
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from hero_tpu.data.downstream_tasks import (ViolinDataset, VideoQaDataset,
                                            build_batch)
from hero_tpu.data.occupancy import VFEAT_INTERVAL, sample_tv_video
from hero_tpu.data.store import (HeroStoreWriter, QueryTokStore,
                                 SubTokStore, VideoFeatStore)
from hero_tpu.data.video import (VideoFeatSubTokDataset, suggest_shapes,
                                 suggest_packed_shapes)

META = {"CLS": 0, "SEP": 2, "PAD": 1, "BOS": 0, "EOS": 2, "MASK": 50264,
        "v_range": [50265, 50272]}


def _write_json(db_dir, name, obj):
    with open(os.path.join(db_dir, name), "w") as f:
        json.dump(obj, f)


def write_tv_corpus(root: str, n_videos: int, vfeat_dim: int,
                    vocab: int, seed: int = 0, n_answers: int = 5):
    """TV-distribution corpus (sub + vfeat dbs) plus TVQA-shaped QA
    queries (~13-BPE question, ``n_answers`` ~6-BPE answers, ts target)
    and VIOLIN-shaped paired statements (~12 BPE)."""
    r = np.random.RandomState(seed)
    tok = lambda n: [int(t) for t in r.randint(3, min(vocab, 50000), n)]
    vids = [f"vid{i}" for i in range(n_videos)]

    vfeat_dir = os.path.join(root, "video_db")
    sub_dir = os.path.join(root, "sub_db")
    id2nframe, vid2len, vid2max_len, vid2sub_len = {}, {}, {}, {}
    vid2dur_idx = {"train": {}}
    with HeroStoreWriter(vfeat_dir) as wv, HeroStoreWriter(sub_dir) as ws:
        for vi, vid in enumerate(vids):
            v = sample_tv_video(r)
            nf = v.n_frames
            id2nframe[vid] = nf
            wv.put(vid, r.randn(nf, vfeat_dim).astype(np.float16))
            # row length in video.py = 1 (lead SEP) + len(input_ids row);
            # sample_tv_video's sub_txt_lens already include that SEP
            input_ids = [tok(max(1, tl - 1)) for tl in v.sub_txt_lens]
            spans, f0 = [], 0
            for fl in v.sub_n_frames:
                spans.append([int((f0 + k) % nf) for k in range(fl)])
                f0 += fl
            ws.put(vid, {
                "input_ids": input_ids,
                "unique_sub2frames": [(i, s) for i, s in enumerate(spans)],
                "unmatched_frames": [],
            })
            vid2len[vid] = nf
            vid2sub_len[vid] = [len(t) for t in input_ids]
            vid2max_len[vid] = (max(len(t) for t in input_ids)
                                + max(len(s) for s in spans))
            vid2dur_idx["train"][vid] = [nf * VFEAT_INTERVAL, vi]
    _write_json(vfeat_dir, "id2nframe.json", id2nframe)
    for name, obj in (("meta.json", META), ("vid2len.json", vid2len),
                      ("vid2max_frame_sub_len.json", vid2max_len),
                      ("vid2dur_idx.json", vid2dur_idx),
                      ("vid2sub_len.json", vid2sub_len)):
        _write_json(sub_dir, name, obj)

    qa_dir = os.path.join(root, "qa_query_db")
    qa_id2len, qa_q2v = {}, {}
    with HeroStoreWriter(qa_dir) as w:
        qid = 0
        for vid in vids:
            dur = id2nframe[vid] * VFEAT_INTERVAL
            for _ in range(2):
                q_ids = tok(int(r.randint(10, 17)))
                answers = [tok(int(r.randint(4, 9)))
                           for _ in range(n_answers)]
                st = float(r.uniform(0, dur * 0.6))
                w.put(str(qid), {
                    "input_ids": [q_ids] + answers,
                    "target": int(r.randint(n_answers)),
                    "ts": [st, st + float(r.uniform(2.0, dur * 0.3))],
                })
                qa_id2len[str(qid)] = len(q_ids)
                qa_q2v[str(qid)] = vid
                qid += 1
    _write_json(qa_dir, "meta.json", META)
    _write_json(qa_dir, "id2len.json", qa_id2len)
    _write_json(qa_dir, "query2video.json", qa_q2v)

    vl_dir = os.path.join(root, "violin_query_db")
    vl_id2len, vl_q2v = {}, {}
    with HeroStoreWriter(vl_dir) as w:
        for i, vid in enumerate(vids):
            for suffix, tgt in (("_0", 0), ("_1", 1)):
                q = f"s{i}{suffix}"
                ids = tok(int(r.randint(9, 16)))
                w.put(q, {"input_ids": ids, "target": tgt})
                vl_id2len[q] = len(ids)
                vl_q2v[q] = vid
    _write_json(vl_dir, "meta.json", META)
    _write_json(vl_dir, "id2len.json", vl_id2len)
    _write_json(vl_dir, "query2video.json", vl_q2v)
    return {"sub": sub_dir, "vfeat": vfeat_dir, "qa": qa_dir,
            "violin": vl_dir}


def measure(step, state, batch, rng, n_steps=20, n_runs=3):
    """Median-of-N steps/s; every artifact records the individual runs
    (the tunnel swings ±15%)."""
    for i in range(3):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
    float(metrics["loss"])                      # compile + warmup
    rates = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, metrics = step(state, batch,
                                  jax.random.fold_in(rng, i + 3))
        float(metrics["loss"])                  # forces the chain
        rates.append(n_steps / (time.perf_counter() - t0))
    rates.sort()
    return rates[len(rates) // 2], rates


def bucket_dict(sp):
    return {"n_rows": sp.n_subs, "txt_len": sp.txt_len,
            "fps": sp.frames_per_sub, "n_frames": sp.n_frames}


def main():
    import shutil
    import tempfile

    from hero_tpu.models import videoqa as videoqa_lib
    from hero_tpu.models import violin as violin_lib
    from hero_tpu.training.step import (TrainSpec, TrainState,
                                        make_train_step)
    from hero_tpu.utils.misc import enable_fast_rng
    enable_fast_rng()

    if SMOKE:
        # tiny dims but TV-length position tables (subs run to ~60+app
        # BPE, clips to 100 frames)
        from hero_tpu.config.model_config import (HeroConfig,
                                                  TransformerConfig)
        base = TransformerConfig(hidden_size=32, num_hidden_layers=2,
                                 num_attention_heads=4,
                                 intermediate_size=128,
                                 max_position_embeddings=514,
                                 vocab_size=256, type_vocab_size=2)
        cfg = HeroConfig(f_config=base,
                         c_config=base.replace(num_hidden_layers=1),
                         q_config=base.replace(num_hidden_layers=0,
                                               type_vocab_size=1),
                         vfeat_dim=64, max_frm_seq_len=100,
                         max_clip_len=100)
        vfeat_dim, vocab = 64, 256
        n_videos, n_steps, n_runs = 6, 2, 1
    else:
        from bench import flagship_config
        cfg = flagship_config()
        vfeat_dim, vocab = 4352, cfg.f_config.vocab_size
        n_videos, n_steps, n_runs = 32, 20, 3

    root = tempfile.mkdtemp(prefix="qa_pack_bench_")
    try:
        dbs = write_tv_corpus(root, n_videos, vfeat_dim, vocab)
        sub_store = SubTokStore(dbs["sub"], max_clip_len=100)
        vfeat = VideoFeatStore(dbs["vfeat"], max_clip_len=100)
        qa_db = QueryTokStore(dbs["qa"])
        vl_db = QueryTokStore(dbs["violin"])

        # the appended-text budget the drivers fold into the bucket:
        # [SEP] q [SEP] a for QA (longest answer), [SEP] stmt for VIOLIN
        qa_app = [2 + len(qa_db[q]["input_ids"][0])
                  + max(len(a) for a in qa_db[q]["input_ids"][1:])
                  for q in qa_db.id2len]
        vl_app = [1 + len(vl_db[q]["input_ids"]) for q in vl_db.id2len]
        results = {}

        for task, qdb, app_lens in (("videoqa", qa_db, qa_app),
                                    ("violin", vl_db, vl_app)):
            app = int(np.ceil(np.percentile(app_lens, 99)))
            extra_len = -(-(app + 2) // 8) * 8    # qa_len/stmt_len bucket
            base = None
            kw = dict(coverage=0.99, max_txt_len=60, append_len=app,
                      base=base)
            sp_u = suggest_shapes(sub_store, **kw)
            sp_p = suggest_packed_shapes(sub_store, **kw)
            sp_u = sp_u.replace(vfeat_dim=vfeat_dim)
            sp_p = sp_p.replace(vfeat_dim=vfeat_dim)
            db_u = VideoFeatSubTokDataset(sub_store, vfeat, sp_u,
                                          max_txt_len=60)
            db_p = VideoFeatSubTokDataset(sub_store, vfeat, sp_p,
                                          max_txt_len=60, pack=True)

            B = 4                   # reference train-{tvqa,violin} batch
            qids = sorted(qdb.id2len)
            if task == "violin":    # paired _0/_1: feed the _0 ids
                qids = [q for q in qids if q.endswith("_0")]
            qids = qids[:B]

            if task == "videoqa":
                A = 5
                make_ds = lambda db: VideoQaDataset(qids, db, qdb,
                                                    qa_len=extra_len)

                def loss_fn(p, batch, rng_):
                    qa_loss, t_loss = videoqa_lib.forward_videoqa(
                        p, cfg, batch, num_answers=A, rng=rng_,
                        train=True, dtype=jnp.bfloat16)
                    return qa_loss + 0.4 * t_loss, {}
                init = videoqa_lib.init_hero_for_videoqa
                lr = 5e-5
            else:
                A = 2               # pos/neg statement pair per item
                make_ds = lambda db: ViolinDataset(qids, db, qdb,
                                                   stmt_len=extra_len)

                def loss_fn(p, batch, rng_):
                    return violin_lib.forward_violin(
                        p, cfg, batch, rng=rng_, train=True,
                        dtype=jnp.bfloat16), {}
                init = violin_lib.init_hero_for_violin
                lr = 3e-5

            spec = TrainSpec(learning_rate=lr, warmup_steps=1000,
                             num_train_steps=10000, grad_norm=1.0)
            rng = jax.random.PRNGKey(1)
            tres = {}
            for name, db in (("unpacked", db_u), ("packed", db_p)):
                ds = make_ds(db)
                batch = build_batch(ds, list(range(len(ds))),
                                    flatten_rows=True)
                jb = {k: jnp.asarray(v) for k, v in batch.items()
                      if not k.startswith("__")}
                params = init(jax.random.PRNGKey(0), cfg)
                step = make_train_step(loss_fn, spec, donate=True)
                state = TrainState.create(params)
                sps, runs = measure(step, state, jb, rng,
                                    n_steps=n_steps, n_runs=n_runs)
                tres[name] = {
                    "questions_per_sec": round(sps * B, 2),
                    "step_ms": round(1000.0 / sps, 2),
                    "backbone_rows": int(jb["sub_input_ids"].shape[0]),
                    "runs_questions_per_sec": [round(x * B, 2)
                                               for x in runs]}
                print(task, name, tres[name], flush=True)
                del state, step, jb
            tres["speedup"] = round(tres["packed"]["questions_per_sec"]
                                    / tres["unpacked"]["questions_per_sec"],
                                    3)
            tres["buckets"] = {"unpacked": bucket_dict(sp_u),
                               "packed": bucket_dict(sp_p),
                               "append_len_p99": app,
                               "qa_or_stmt_len": extra_len}
            results[task] = tres
    finally:
        shutil.rmtree(root, ignore_errors=True)

    results["batch_questions"] = 4
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_QA_PACKING.json")
    if not SMOKE:
        with open(out, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
