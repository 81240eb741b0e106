"""Data layer: stores, datasets, fixed-shape batching, host prefetch.

TPU-native re-design of the reference ``data/`` package (SURVEY.md §2.2):
ragged python batches become fixed-shape bucketed numpy structs so every
train/eval step compiles once.
"""
