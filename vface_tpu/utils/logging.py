"""Metrics logging — the wandb replacement (JSON-lines + stdout).

The reference hard-wires wandb with an embedded API key
(`/root/reference/REFace/main.py:24-25, 531-534` — key deliberately NOT
replicated; SURVEY §5 flags it) and logs loss dicts from inside the loss
(ddpm.py:1676, 1835). Here: a dependency-free JSONL metrics writer with the
same ergonomics, suitable for offline scraping into any dashboard.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, logdir: str, name: str = "metrics", echo: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, f"{name}.jsonl")
        self.echo = echo
        self._f = open(self.path, "a", buffering=1)

    def log(self, step: int, values: Dict[str, Any], prefix: Optional[str] = None) -> None:
        rec = {"step": int(step), "ts": time.time()}
        for k, v in values.items():
            key = f"{prefix}/{k}" if prefix else k
            try:
                rec[key] = float(v)
            except (TypeError, ValueError):
                rec[key] = v
        self._f.write(json.dumps(rec) + "\n")
        if self.echo:
            shown = {k: v for k, v in rec.items() if k not in ("ts",)}
            print(f"[metrics] {shown}")

    def close(self) -> None:
        self._f.close()
