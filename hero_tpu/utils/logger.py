"""Logging + TensorBoard-style metric logging with process-0 gating.

Mirrors the reference's ``utils/logger.py``: a global ``LOGGER``, an optional
file handler, a metric writer that is a no-op off process 0, and a
``RunningMeter`` EMA smoother (0.99) for per-loss meters.

TensorBoard output uses ``tensorboardX``/``torch.utils.tensorboard`` if
available, else falls back to a JSONL scalar log — observability never
depends on an optional package.
"""

from __future__ import annotations

import json
import logging
import math
import os
import sys
from typing import Optional

_LOG_FMT = "%(asctime)s - %(levelname)s - %(name)s -   %(message)s"
_DATE_FMT = "%m/%d/%Y %H:%M:%S"
logging.basicConfig(format=_LOG_FMT, datefmt=_DATE_FMT, level=logging.INFO,
                    stream=sys.stdout)
LOGGER = logging.getLogger("hero_tpu")


def add_log_to_file(log_path: str) -> None:
    os.makedirs(os.path.dirname(log_path), exist_ok=True)
    fh = logging.FileHandler(log_path)
    fh.setFormatter(logging.Formatter(_LOG_FMT, datefmt=_DATE_FMT))
    LOGGER.addHandler(fh)


class NoOp:
    """Serves as a no-op metric writer on non-zero processes."""

    def __getattr__(self, name):
        return lambda *args, **kwargs: None


class ScalarWriter:
    """Scalar metric writer: TensorBoard if importable, JSONL always."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore
            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass
        self._global_step = 0

    def set_step(self, step: int) -> None:
        self._global_step = step

    def add_scalar(self, tag: str, value: float,
                   step: Optional[int] = None) -> None:
        step = self._global_step if step is None else step
        value = float(value)
        self._jsonl.write(json.dumps({"step": step, tag: value}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def log_scalar_dict(self, d: dict, prefix: str = "",
                        step: Optional[int] = None) -> None:
        for k, v in d.items():
            if isinstance(v, (int, float)):
                name = f"{prefix}_{k}" if prefix else k
                self.add_scalar(name, v, step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class RunningMeter:
    """Exponential-moving-average meter (smooth=0.99, reference
    ``utils/logger.py`` RunningMeter)."""

    def __init__(self, name: str, val: Optional[float] = None,
                 smooth: float = 0.99):
        self._name = name
        self._sm = smooth
        self._val = val

    def __call__(self, value: float) -> None:
        value = float(value)
        if math.isnan(value) or math.isinf(value):
            return
        self._val = (value if self._val is None
                     else self._val * self._sm + value * (1 - self._sm))

    def __str__(self) -> str:
        return f"{self._name}: {self._val:.4f}"

    @property
    def val(self) -> float:
        return 0.0 if self._val is None else self._val

    @property
    def name(self) -> str:
        return self._name
