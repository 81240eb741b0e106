"""Standalone VR-only inference (reference ``eval_vr.py``): the VCMR
pipeline restricted to the VR task."""

from __future__ import annotations

from hero_tpu.drivers import eval_vcmr


def main(args):
    from hero_tpu.parallel.mesh import init_distributed
    init_distributed()
    from hero_tpu.drivers.common import eval_opts_from
    orig = eval_opts_from

    def vr_opts(opts):
        import dataclasses
        return dataclasses.replace(orig(opts), full_eval_tasks=("VR",))

    import hero_tpu.drivers.common as common_mod
    from hero_tpu.data.store import MsrvttQueryTokStore
    common_mod.eval_opts_from = vr_opts
    orig_store = eval_vcmr.QUERY_STORE_CLS
    eval_vcmr.QUERY_STORE_CLS = MsrvttQueryTokStore
    try:
        return eval_vcmr.main(args)
    finally:
        common_mod.eval_opts_from = orig
        eval_vcmr.QUERY_STORE_CLS = orig_store


if __name__ == "__main__":
    main(eval_vcmr.build_argparser().parse_args())
