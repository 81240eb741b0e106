"""Model stack: functional JAX modules mirroring HERO's capability surface.

Layering (matches SURVEY.md §2.1): nn → transformer/embed → encoder →
model (backbone) → pretrain / task heads.
"""
