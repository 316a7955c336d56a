"""Wall-clock benchmarker + device memory stats.

TPU-native port of the reference Benchmarker
(reference: src/misc/benchmarker.py:11-36): a context-manager timer keyed by
tag with per-call normalization and JSON dump, plus XLA device memory stats
replacing `torch.cuda.memory_stats` peak-bytes reporting.
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from contextlib import contextmanager
from pathlib import Path

import jax


class Benchmarker:
    def __init__(self):
        self.execution_times: dict[str, list[float]] = defaultdict(list)

    @contextmanager
    def time(self, tag: str, num_calls: int = 1):
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            for _ in range(num_calls):
                self.execution_times[tag].append(elapsed / num_calls)

    def summarize(self) -> dict:
        return {
            tag: {
                "mean_s": sum(ts) / len(ts),
                "count": len(ts),
                "total_s": sum(ts),
            }
            for tag, ts in self.execution_times.items()
        }

    def dump(self, path: str | Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(self.summarize(), indent=2))

    def dump_memory(self, path: str | Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        stats = {}
        for i, dev in enumerate(jax.local_devices()):
            s = dev.memory_stats() or {}
            stats[f"device_{i}"] = {
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_in_use": s.get("bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
        path.write_text(json.dumps(stats, indent=2))

    def clear(self) -> None:
        self.execution_times.clear()
