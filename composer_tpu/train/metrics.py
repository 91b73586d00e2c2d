"""Training observability: TensorBoard scalars + JSONL fallback.

Scalar-name parity with the reference (transformer.py:933-951): per-step
``loss`` / ``accuracy`` and per-epoch ``epoch_loss`` / ``epoch_accuracy``
under ``<logdir>/train``.
"""

from __future__ import annotations

import json
import time
from pathlib import Path


class MetricsWriter:
    """Writes scalars to TensorBoard when tensorboardX is available, and
    always to a ``metrics.jsonl`` file (greppable, TF-free)."""

    def __init__(self, logdir):
        self.logdir = Path(logdir)
        self.logdir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.logdir / "metrics.jsonl", "a")
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(str(self.logdir))
        except Exception:
            self._tb = None

    def scalar(self, name: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(name, float(value), int(step))
        self._jsonl.write(
            json.dumps(
                {"time": time.time(), "name": name, "value": float(value), "step": int(step)}
            )
            + "\n"
        )

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()
        self._jsonl.flush()

    def close(self) -> None:
        self.flush()
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()
