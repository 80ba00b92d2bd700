"""Training reporting: the `training_report` equivalent
(`train_scene.py:159-202`).

The reference optionally logs scalars/images/histograms to TensorBoard and
prints held-out L1/PSNR at the test iterations.  Here: a `TrainingReporter`
that always writes an append-only ``metrics.jsonl`` (machine-readable, no
extra deps) and mirrors scalars/images/histograms to TensorBoard when
``torch.utils.tensorboard`` is importable — same directory layout as the
reference (`model_path` as the log dir, `train_scene.py:159-165`).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np


class TrainingReporter:
    def __init__(self, model_path: str, enable_tensorboard: bool = True):
        self.model_path = model_path
        os.makedirs(model_path, exist_ok=True)
        self._jsonl = open(os.path.join(model_path, "metrics.jsonl"), "a")
        self._t0 = time.time()
        self._tb = None
        if enable_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(model_path)
            except Exception:
                self._tb = None  # tensorboard optional (reference parity:
                # `train_scene.py:26-30` degrades to prints)

    def scalars(self, iteration: int, tag_values: dict, prefix: str = ""):
        rec = {"iter": int(iteration), "t": round(time.time() - self._t0, 3)}
        for k, v in tag_values.items():
            rec[prefix + k] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(prefix + k, float(v), iteration)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def image(self, iteration: int, tag: str, img: np.ndarray):
        """(H, W, C) float image in [0, 1] (`training_report` logs renders
        vs ground truth at the test iterations)."""
        if self._tb is not None:
            self._tb.add_image(
                tag, np.clip(np.asarray(img), 0, 1), iteration,
                dataformats="HWC",
            )

    def histogram(self, iteration: int, tag: str, values: np.ndarray):
        """Opacity histogram analogue (`train_scene.py:199-201`)."""
        if self._tb is not None:
            self._tb.add_histogram(tag, np.asarray(values), iteration)

    def eval_report(self, iteration: int, split: str, l1: float, psnr: float):
        print(f"[ITER {iteration}] {split}: L1 {l1:.5f} PSNR {psnr:.2f}",
              flush=True)
        self.scalars(iteration, {f"{split}/l1": l1, f"{split}/psnr": psnr})

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
