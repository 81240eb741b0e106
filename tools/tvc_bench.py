"""TVC caption-generation benchmark: KV-cached decode throughput on one chip.

Measures the full generation path of ``inf_tvc`` (reference
``inf_tvc.py:30-98`` / ``model/tvc.py:301-330``) at the flagship TVC
config (f6/c3/d2, hero_tvc.json): backbone encode of the clip batch +
the one-jit greedy scan (and beam-3), device-resident inputs.  Reports
captions/s, prints ONE JSON line, writes BENCH_TVC.json.

Round 5: measures BOTH encode layouts — the legacy unpacked bucket and
the production ``--pack_subs`` layout (TV-distribution subs packed
behind the block-diagonal segment mask; decode itself is layout-
independent, only the backbone encode changes) — with median-of-3
sampling per layout (VERDICT r4 weak #3/#10).  The headline ``value``
is the packed (production) number.

``vs_baseline`` compares greedy captions/s against an analytic V100 model
of the REFERENCE's generator, which re-runs the FULL decoder stack over
the whole prefix every step with no KV cache (``model/tvc.py:301-330``,
acknowledged in its own comment) and applies the LM head to every prefix
position (``decode`` at ``:240-266``):

- encode: the same backbone forward (amortized per caption);
- per step t = 1..max_gen: 2 decoder layers over t tokens — self-attn
  projections 6·t·D², cross-attn K/V re-projection 4·Lv·D² (recomputed
  per call), FFN 4·t·D·I — plus LM head 2·t·D·(D+V) over all t prefix
  positions;
- V100 sustaining the same 30% of 125 TFLOP/s fp16 that bench.py
  assumes (generous: decode at batch 8·prefix≤30 is memory-bound in
  practice, well below that).

Our path pays the decoder ONCE per new token (KV cache) and the LM head
only on the newest position — the architectural win this measures.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from hero_tpu.data import synthetic
from hero_tpu.models import tvc as tvc_lib
from hero_tpu.utils.misc import enable_fast_rng

BOS, EOS = 0, 2


def flagship_tvc_config():
    cfg = bench.flagship_config()
    return cfg.replace(d_config=cfg.f_config.replace(num_hidden_layers=2))


def v100_captions_per_sec(n_videos, n_caps, Lv, max_gen, cfg):
    D = cfg.f_config.hidden_size
    I = cfg.f_config.intermediate_size
    V = cfg.f_config.vocab_size
    L = cfg.d_config.num_hidden_layers
    sum_t = max_gen * (max_gen + 1) // 2
    dec = L * (6 * sum_t * D * D            # self q/k/v + out proj
               + 4 * Lv * D * D * max_gen   # cross K/V re-projection
               + 2 * sum_t * Lv * D * 2     # cross scores + values
               + 4 * sum_t * D * I)         # FFN
    head = 2 * sum_t * D * (D + V)          # dense + tied decoder
    # encode: backbone fwd per video, shared across its captions
    shape = synthetic.BatchShape(batch=1, n_subs=16, txt_len=40,
                                 frames_per_sub=16, n_frames=100,
                                 n_queries=1, query_len=30)
    enc = (bench.analytic_train_flops_per_example(shape, cfg) / 3.0
           ) * n_videos / n_caps
    return 0.30 * 125e12 / (dec + head + enc)


def _median_rate(fn, out_sync, n_caps, n_rep=8, n_runs=3):
    """Median-of-N captions/s for one compiled program (runs recorded)."""
    out = fn()
    out_sync(out)                          # compile + tunnel sync
    rates = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        for _ in range(n_rep):
            out = fn()
        out_sync(out)
        rates.append(n_caps / ((time.perf_counter() - t0) / n_rep))
    rates.sort()
    return rates[len(rates) // 2], [round(x, 1) for x in rates]


def _caption_keys(r, n_videos, caps_per_video, Lv):
    n_caps = n_videos * caps_per_video
    return {
        "cap_vidx": jnp.asarray(
            np.repeat(np.arange(n_videos, dtype=np.int32), caps_per_video)),
        "seg_idx": jnp.asarray(np.sort(
            r.randint(0, 100, (n_caps, Lv)).astype(np.int32), axis=1)),
        "seg_mask": jnp.ones((n_caps, Lv), jnp.float32),
    }


def main(n_videos=16, caps_per_video=4, Lv=32, max_gen=30,
         write_artifact=True):
    enable_fast_rng()
    cfg = flagship_tvc_config()
    params = jax.device_put(
        tvc_lib.init_hero_for_tvc(jax.random.PRNGKey(0), cfg))
    n_caps = n_videos * caps_per_video

    # unpacked (legacy bucket) encode layout
    shape = synthetic.BatchShape(batch=n_videos, n_subs=16, txt_len=40,
                                 frames_per_sub=16, n_frames=100,
                                 n_queries=1, query_len=30)
    r = np.random.RandomState(0)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic.base_batch(shape, seed=1).items()}
    batch.update(_caption_keys(r, n_videos, caps_per_video, Lv))
    batch = jax.device_put(batch)

    # packed (--pack_subs production) encode layout: same TV content
    # class, several subs per f-encoder row (segment mask in-kernel)
    import dataclasses as _dc
    from hero_tpu.data.occupancy import sample_tv_video
    rp = np.random.RandomState(3)
    p_shape = _dc.replace(synthetic.TV_PACKED, batch=n_videos, n_queries=1)
    p_raw, _ = synthetic.tv_vsm_batch(
        [sample_tv_video(rp) for _ in range(n_videos)], p_shape,
        packed=True, seed=3)
    p_batch = {k: jnp.asarray(v) for k, v in p_raw.items()
               if k.startswith(("sub_", "c_"))}
    p_batch.update(_caption_keys(np.random.RandomState(0), n_videos,
                                 caps_per_video, Lv))
    p_batch = jax.device_put(p_batch)

    greedy = jax.jit(lambda p, b: tvc_lib.greedy_decode(
        p, cfg, b, max_step=max_gen, bos=BOS, eos=EOS, dtype=jnp.bfloat16))
    beam = jax.jit(lambda p, b: tvc_lib.beam_decode(
        p, cfg, b, max_step=max_gen, bos=BOS, eos=EOS, beam=3,
        dtype=jnp.bfloat16))
    sync = lambda out: float(jnp.sum(out))

    cps_u, runs_u = _median_rate(lambda: greedy(params, batch), sync, n_caps)
    cps, runs_p = _median_rate(lambda: greedy(params, p_batch), sync, n_caps)
    cps_beam, runs_b = _median_rate(lambda: beam(params, p_batch), sync,
                                    n_caps)

    v100 = v100_captions_per_sec(n_videos, n_caps, Lv, max_gen, cfg)
    print(f"# greedy packed: {cps:.1f} cap/s (runs {runs_p}); unpacked "
          f"{cps_u:.1f} (runs {runs_u}); analytic V100 no-KV-cache: "
          f"{v100:.1f}", file=sys.stderr, flush=True)
    print(f"# beam-3 packed: {cps_beam:.1f} cap/s (runs {runs_b})",
          file=sys.stderr, flush=True)
    result = {
        "metric": "tvc_greedy_captions_per_sec_per_chip",
        "value": round(cps, 1),
        "unit": "captions/s",
        "vs_baseline": round(cps / v100, 3),
        "layout": "packed --pack_subs encode (decode layout-independent)",
        "runs": runs_p,
        "unpacked_captions_per_sec": round(cps_u, 1),
        "unpacked_runs": runs_u,
        "unpacked_vs_baseline": round(cps_u / v100, 3),
        "beam3_captions_per_sec": round(cps_beam, 1),
        "beam3_runs": runs_b,
        "max_gen_step": max_gen,
    }
    print(json.dumps(result))
    if write_artifact:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_TVC.json")
        with open(path, "w") as f:
            json.dump(result, f, indent=2)
    return result


if __name__ == "__main__":
    main()
