"""CLI drivers (the reference's L5 layer): pretrain, train_*, eval_*.

Run as ``python -m hero_tpu.drivers.train_vcmr --config config.json`` —
the same JSON experiment configs as the reference load verbatim.
"""
