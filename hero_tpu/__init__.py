"""hero_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video+language framework.

Re-implements the full capability surface of HERO (Hierarchical Encoder for
Video+Language Omni-representation, EMNLP 2020) with a TPU-first design:

- bf16 pjit-compiled training over a ``jax.sharding.Mesh`` data axis; gradient
  ``pmean`` and the VSM cross-replica negative pool fall out of GSPMD global
  batch semantics instead of Horovod collectives.
- Pallas flash-attention and fused-layernorm kernels for the two encoders.
- Fixed-shape bucketed batches (no ragged ``total_subs`` sequences): the
  reference's python-loop scatter of fused subtitle outputs onto the frame
  timeline becomes a vectorized ``scatter-add`` keyed by precomputed index
  arrays built in the input pipeline.
- A native C++ record store ("herostore") replacing the reference's LMDB
  dependency for feature/text databases.

See ``SURVEY.md`` at the repo root for the structural map of the reference.
"""

__version__ = "0.1.0"
