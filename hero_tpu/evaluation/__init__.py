"""Evaluation: retrieval metrics, NMS post-processing, full-corpus VCMR/VR
inference pipelines, QA/entailment accuracy, caption metrics.

Host-side logic (decode, NMS, metric aggregation) is numpy and matches the
reference protocol bit-for-bit; scoring runs jit'd on device.
"""
