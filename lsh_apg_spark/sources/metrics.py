"""Per-stage metrics sink (maps S9 result sinks, src/alg.h:98-134, and
the Performance accumulator, src/Query.h:10-42): one JSONL row per
stage per run, appended — the regression record the reference keeps as
CSV appends (LSH-G_div_result.csv)."""

from __future__ import annotations

import json
import os
import time


class MetricsSink:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, stage: str, **fields) -> dict:
        row = {"stage": stage, "epoch": int(time.time()), **fields}
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")
        return row

    def read_all(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]
