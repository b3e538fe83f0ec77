"""Metrics logging: JSONL scalar logger + wall-clock throughput meter.

Replaces the reference's tqdm-progress-bar observability
(src/networks.py:75-98) with a persistent, machine-readable log. Scalars
are computed on device and fetched only at log cadence (no per-step host
sync).
"""

from __future__ import annotations

import json
import time

__all__ = ["JsonlLogger", "Throughput"]


class JsonlLogger:
    """Append-only JSONL metrics log; also optionally echoes to stdout."""

    def __init__(self, path: str | None = None, echo: bool = False):
        self.path = path
        self.echo = echo
        self._f = open(path, "a") if path else None

    def __call__(self, entry: dict) -> None:
        line = json.dumps(entry)
        if self._f:
            self._f.write(line + "\n")
            self._f.flush()
        if self.echo:
            print(line, flush=True)

    def close(self) -> None:
        if self._f:
            self._f.close()
            self._f = None


class Throughput:
    """Steps/second meter over a sliding window."""

    def __init__(self):
        self.t0 = time.time()
        self.n = 0

    def update(self, steps: int = 1) -> float:
        self.n += steps
        dt = time.time() - self.t0
        return self.n / dt if dt > 0 else float("inf")
