"""MSR-VTT video-retrieval finetuning (reference ``train_vr.py``):
VCMR minus span supervision — asserts lw_st_ed == 0 and uses VrDataset
(targets fixed at -1) plus MsrvttQueryTokLmdb-style query keys
(reference train_vr.py:78-114, data/vr.py:50-61)."""

from __future__ import annotations

from hero_tpu.config import opts as opts_lib
from hero_tpu.drivers import train_vcmr


def main(opts):
    from hero_tpu.parallel.mesh import init_distributed
    init_distributed()
    assert getattr(opts, "lw_st_ed", 0) == 0, "For VR, lw_st_ed must be 0"
    opts.lw_st_ed = 0.0
    opts.drop_svmr_prob = 1.0
    import hero_tpu.data.downstream_tasks as dt
    from hero_tpu.data.store import MsrvttQueryTokStore
    train_vcmr.main(opts, dataset_cls=dt.VrDataset,
                    query_store_cls=MsrvttQueryTokStore)


if __name__ == "__main__":
    main(opts_lib.get_vr_args())
