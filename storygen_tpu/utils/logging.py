"""Metrics logging + run-record utilities.

Reference parity: accelerator.log({loss, lr}) each step to tensorboard
(train_StorySalon_stage2.py:359-361) and get_function_args config dump
(utils/util.py:13-17). Here: JSONL metrics (always) + tensorboard events
when tensorflow is available, plus get_time_string for log dirs.
"""
from __future__ import annotations

import json
import os
import time
from datetime import datetime
from typing import Dict


def get_time_string() -> str:
    """Timestamp suffix for log dirs (utils/util.py:9-10 parity)."""
    return datetime.now().strftime("%Y%m%dT%H%M%S")


class MetricLogger:
    def __init__(self, logdir: str, name: str = "StoryGen"):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, "metrics.jsonl")
        self._tb = None
        try:
            import tensorflow as tf  # optional
            self._tb = tf.summary.create_file_writer(
                os.path.join(logdir, "tb"))
        except Exception:
            pass

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": step, "time": time.time(), **metrics}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(k, v, step=step)
            self._tb.flush()
        print(f"step {step}: " + " ".join(f"{k}={v:.5g}"
                                          for k, v in metrics.items()))
