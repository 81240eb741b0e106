"""Standalone VR-only inference (reference ``eval_vr.py``): the VCMR
pipeline restricted to the VR task with MSR-VTT query keys
(reference eval_vr.py:69)."""

from __future__ import annotations

from hero_tpu.drivers import eval_vcmr


def main(args):
    from hero_tpu.parallel.mesh import init_distributed
    init_distributed()
    from hero_tpu.data.store import MsrvttQueryTokStore
    return eval_vcmr.main(args, query_store_cls=MsrvttQueryTokStore,
                          full_eval_tasks=("VR",))


if __name__ == "__main__":
    main(eval_vcmr.build_argparser().parse_args())
