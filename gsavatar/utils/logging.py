"""JSONL metric logger (stands in for the reference's wandb system of record,
SURVEY.md §5; a wandb hook can be layered on when the package exists)."""
from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricLogger:
    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.history: list = []
        if path:
            os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
            self._f = open(path, 'a')
        else:
            self._f = None

    def log(self, step: int, metrics: dict):
        rec = {'step': int(step), 'time': time.time(), **metrics}
        self.history.append(rec)
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()

    def close(self):
        if self._f:
            self._f.close()
