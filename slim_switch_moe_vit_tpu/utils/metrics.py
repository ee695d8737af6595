"""Metric smoothing + iteration logging (reference: ``utils.py:55-211``).

``SmoothedValue``/``MetricLogger`` mirror the reference's windowed meters and
``log_every`` generator (iter/data timing, ETA) without torch. Cross-process
sync uses a jax collective when multiple processes exist
(reference: NCCL all_reduce at ``utils.py:73-84``).
"""
from __future__ import annotations

import datetime
import time
import typing as typ
from collections import defaultdict, deque

import numpy as np


def _device_max_mem_mb() -> typ.Optional[float]:
    """Peak device-memory use in MB, or None when the backend doesn't report
    it (reference prints CUDA max mem each log line, utils.py:186-203)."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
    except Exception:  # noqa: BLE001 - never let logging break training
        return None
    if not stats:
        return None
    peak = stats.get("peak_bytes_in_use")
    if peak is None:
        return None
    return peak / (1024.0 * 1024.0)


class SmoothedValue:
    """Track a series of values; smoothed window stats + global average
    (reference utils.py:55-115)."""

    def __init__(self, window_size: int = 20, fmt: typ.Optional[str] = None):
        if fmt is None:
            fmt = "{median:.4f} ({global_avg:.4f})"
        self.deque: typ.Deque[float] = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        self.deque.append(float(value))
        self.count += n
        self.total += float(value) * n

    def synchronize_between_processes(self):
        """all_reduce (count, total) across hosts (reference utils.py:73-84)."""
        import jax

        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        arr = np.asarray([self.count, self.total], dtype=np.float64)
        summed = multihost_utils.process_allgather(arr).sum(axis=0)
        self.count = int(summed[0])
        self.total = float(summed[1])

    @property
    def median(self):
        return float(np.median(np.asarray(self.deque))) if self.deque else 0.0

    @property
    def avg(self):
        return float(np.mean(np.asarray(self.deque))) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def max(self):
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value,
        )


class MetricLogger:
    """reference utils.py:118-211."""

    def __init__(self, delimiter: str = "\t"):
        self.meters: typ.Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items()
        )

    def synchronize_between_processes(self):
        for meter in self.meters.values():
            meter.synchronize_between_processes()

    def add_meter(self, name: str, meter: SmoothedValue):
        self.meters[name] = meter

    def log_every(self, iterable, print_freq: int, header: str = "",
                  total: typ.Optional[int] = None):
        i = 0
        if total is None:
            try:
                total = len(iterable)
            except TypeError:
                total = 0
        start_time = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        space_fmt = ":" + str(len(str(total))) + "d"
        has_mem = _device_max_mem_mb() is not None
        log_msg = self.delimiter.join(
            [header, "[{0" + space_fmt + "}/{1}]", "eta: {eta}", "{meters}",
             "time: {time}", "data: {data}"]
            + (["max mem: {memory:.0f}MB"] if has_mem else [])
        )
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 or i == total - 1:
                eta = iter_time.global_avg * (total - i)
                extra = ({"memory": _device_max_mem_mb() or 0.0}
                         if has_mem else {})
                print(log_msg.format(
                    i, total, eta=str(datetime.timedelta(seconds=int(eta))),
                    meters=str(self), time=str(iter_time), data=str(data_time),
                    **extra,
                ))
            i += 1
            end = time.time()
        total_time = time.time() - start_time
        print("{} Total time: {} ({:.4f} s / it)".format(
            header, str(datetime.timedelta(seconds=int(total_time))),
            total_time / max(i, 1),
        ))
