"""Scalar logging: JSONL stream + CSV export (+ optional TensorBoard).

Replaces the reference's SummaryWriter usage
(train_adv_supervised_segmentation_triplet.py:120-121,241-255,277-283):
scalars go to ``{log_dir}/scalars.jsonl`` (one `{"step": s, "tag": t,
"value": v}` per line) and can be exported to JSON like the reference's
``export_scalars_to_json``.  If a TensorBoard writer is importable
(torch.utils.tensorboard ships in this image), it is mirrored there too.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from os.path import join
from typing import Dict, Optional


class ScalarLogger:
    def __init__(self, log_dir: Optional[str], use_tensorboard: bool = True,
                 purge_step: Optional[int] = None):
        self.log_dir = log_dir
        self._file = None
        self._tb = None
        self.history: Dict[str, list] = defaultdict(list)
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._file = open(join(log_dir, "scalars.jsonl"), "a")
            if use_tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    self._tb = SummaryWriter(log_dir=log_dir, purge_step=purge_step)
                except Exception:
                    self._tb = None

    def add_scalar(self, tag: str, value, step: int) -> None:
        value = float(value)
        self.history[tag].append((step, value))
        if self._file:
            self._file.write(json.dumps({"step": step, "tag": tag, "value": value}) + "\n")
            self._file.flush()
        if self._tb:
            self._tb.add_scalar(tag, value, step)

    def export_scalars_to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({tag: vals for tag, vals in self.history.items()}, f)

    def close(self) -> None:
        if self._file:
            self._file.close()
            self._file = None
        if self._tb:
            self._tb.close()
            self._tb = None
