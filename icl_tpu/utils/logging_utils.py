"""Logging/observability: file logger + TensorBoard scalars.

Replicates the reference schema for comparability (SURVEY.md §2.7):
  * python logging → {snapshot}/log.txt, format '[%H:%M:%S.%ms] msg'
    (train_…unet_2D.py:247-248)
  * tensorboardX SummaryWriter at {snapshot}/log with tags Loss/*,
    Info/lr, metric_all/*, metric_class_{name}/* (:137-203)
Falls back to a JSONL writer if tensorboardX is unavailable.
"""
from __future__ import annotations

import json
import logging
import os
import time


def setup_logging(snapshot_path: str) -> logging.Logger:
    os.makedirs(snapshot_path, exist_ok=True)
    logger = logging.getLogger("icl_tpu")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fh = logging.FileHandler(os.path.join(snapshot_path, "log.txt"))
    fh.setFormatter(
        logging.Formatter("[%(asctime)s.%(msecs)03d] %(message)s", datefmt="%H:%M:%S")
    )
    logger.addHandler(fh)
    sh = logging.StreamHandler()
    sh.setFormatter(logging.Formatter("%(message)s"))
    logger.addHandler(sh)
    return logger


class ScalarWriter:
    """TensorBoard scalar writer with JSONL fallback."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._tb = None
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(logdir)
        except Exception:
            pass
        self._jsonl = open(os.path.join(logdir, "scalars.jsonl"), "a")

    def add_scalar(self, tag: str, value, step: int) -> None:
        value = float(value)
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        self._jsonl.write(
            json.dumps({"tag": tag, "value": value, "step": int(step),
                        "time": time.time()}) + "\n"
        )

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()
        self._jsonl.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()
