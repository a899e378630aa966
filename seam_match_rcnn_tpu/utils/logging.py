"""Metric logging / observability.

Equivalent of the reference's ``SmoothedValue`` / ``MetricLogger``
(/root/reference/stuffs/utils.py:215-435): windowed medians + global
averages, periodic console lines with iteration/data timing, ETA and device
memory, plus scalar sinks (JSONL always; TensorBoard when available).  The
reference's cross-rank meter sync (utils.py:233-244) is unnecessary under
single-controller JAX — jitted losses are already global.
"""

from __future__ import annotations

import collections
import datetime
import json
import os
import time
from typing import Dict, Iterable, Optional

import numpy as np

import jax


class SmoothedValue:
    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = collections.deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        v = float(value)
        self.deque.append(v)
        self.count += n
        self.total += v * n

    @property
    def median(self):
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self):
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            value=self.value,
        )


def device_memory_mb() -> float:
    """Peak device memory (the reference logs torch.cuda.max_memory_allocated
    at stuffs/utils.py:424); jax exposes per-device live bytes."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        return (stats or {}).get("peak_bytes_in_use", 0) / (1024.0 * 1024.0)
    except Exception:
        return 0.0


class ScalarWriter:
    """JSONL scalar sink + optional TensorBoard (the reference writes TB
    scalars every print_freq, stuffs/engine.py:48-52)."""

    def __init__(self, log_dir: Optional[str]):
        self.log_dir = log_dir
        self._jsonl = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value: float, global_step: int):
        if self._jsonl:
            self._jsonl.write(json.dumps(
                {"tag": tag, "value": float(value), "step": int(global_step),
                 "time": time.time()}) + "\n")
            self._jsonl.flush()
        if self._tb:
            self._tb.add_scalar(tag, value, global_step=global_step)

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = collections.defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def add_meter(self, name: str, meter: SmoothedValue):
        self.meters[name] = meter

    def __str__(self):
        return self.delimiter.join(f"{k}: {m}" for k, m in self.meters.items())

    def log_every(self, iterable: Iterable, print_freq: int, header: str = "",
                  total: Optional[int] = None):
        i = 0
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        end = time.time()
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0:
                if total:
                    eta = iter_time.global_avg * (total - i)
                    eta_s = str(datetime.timedelta(seconds=int(eta)))
                else:
                    eta_s = "?"
                print(self.delimiter.join([
                    header, f"[{i}" + (f"/{total}]" if total else "]"),
                    f"eta: {eta_s}", str(self), f"time: {iter_time}",
                    f"data: {data_time}", f"mem: {device_memory_mb():.0f}MB",
                ]))
            i += 1
            end = time.time()
        if i and (i - 1) % print_freq != 0:
            # final-iteration line (reference prints on
            # `i == len(iterable) - 1` too, stuffs/utils.py log_every) —
            # otherwise the last <print_freq iterations' meter state never
            # reaches the console
            print(self.delimiter.join([
                header, f"[{i - 1}" + (f"/{total}]" if total else "]"),
                str(self), f"time: {iter_time}", f"data: {data_time}",
                f"mem: {device_memory_mb():.0f}MB",
            ]))
        dur = time.time() - start
        print(f"{header} Total time: {str(datetime.timedelta(seconds=int(dur)))}")
