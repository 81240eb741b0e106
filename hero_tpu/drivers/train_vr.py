"""MSR-VTT video-retrieval finetuning (reference ``train_vr.py``):
VCMR minus span supervision — asserts lw_st_ed == 0 and uses VrDataset
(targets fixed at -1)."""

from __future__ import annotations

from hero_tpu.config import opts as opts_lib
from hero_tpu.drivers import train_vcmr


def main(opts):
    assert getattr(opts, "lw_st_ed", 0) == 0, "For VR, lw_st_ed must be 0"
    opts.lw_st_ed = 0.0
    opts.drop_svmr_prob = 1.0
    # swap the dataset class used by the vcmr driver
    import hero_tpu.data.downstream_tasks as dt
    orig = train_vcmr.VcmrDataset
    train_vcmr.VcmrDataset = dt.VrDataset
    try:
        train_vcmr.main(opts)
    finally:
        train_vcmr.VcmrDataset = orig


if __name__ == "__main__":
    main(opts_lib.get_vr_args())
