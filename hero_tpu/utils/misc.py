"""Misc helpers (reference ``utils/misc.py``)."""

from __future__ import annotations

import random
from typing import Any

import numpy as np


class Struct:
    """dict → attribute access (used to reload train-time hps.json as the
    serve-time config, matching reference ``eval_vcmr.py:56-58``)."""

    def __init__(self, d: dict):
        self.__dict__.update(d)

    def __contains__(self, k) -> bool:
        return k in self.__dict__

    def get(self, k, default=None) -> Any:
        return self.__dict__.get(k, default)

    def to_dict(self) -> dict:
        return dict(self.__dict__)


def set_random_seed(seed: int) -> None:
    """Seed host-side RNGs (python + numpy). Device-side randomness is
    exclusively jax.random keyed from the experiment seed."""
    random.seed(seed)
    np.random.seed(seed)


def enable_fast_rng() -> None:
    """Switch JAX's default PRNG to the hardware 'rbg' generator.

    Dropout-mask generation with the default threefry PRNG costs ~10 ms
    per recipe-size train step on v5e; rbg uses the TPU's native RNG
    instructions.  Training-only knob (tests keep threefry determinism
    across platforms)."""
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")


def params_to_device(tree: Any) -> Any:
    """``jax.device_put`` for HOST (numpy) leaves only.

    Evaluation entry points receive params either from a checkpoint load
    (host numpy — must be put once, or jit bakes them into the HLO and
    flagship-size programs blow the tunnel's compile request limit) or
    from a live TrainState (already-committed ``jax.Array``s — in a
    multi-process run these are GLOBAL arrays, which a bare
    ``device_put`` rejects as not fully addressable).  Put the former,
    pass the latter through unchanged.
    """
    import jax
    return jax.tree.map(
        lambda x: x if isinstance(x, jax.Array) else jax.device_put(x),
        tree)
