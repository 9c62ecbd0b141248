"""Metric logging / observability.

Rebuild of the reference's MetricLogger/SmoothedValue
(dino-main/utils.py:224-400) and AverageMeter/ProgressMeter
(Unsupervised-Classification-master/utils/utils.py:19-58), plus a step
timer that reports device memory via jax (the torch.cuda.max_memory
equivalent) and hooks for jax.profiler traces — which the reference lacks
entirely (SURVEY.md section 5: "no profiler hooks").
"""

from __future__ import annotations

import collections
import datetime
import time
from collections.abc import Iterable

import numpy as np


class SmoothedValue:
    """Windowed + global average tracker (dino-main/utils.py:224-273).

    In multi-process (multi-host JAX) runs, call
    ``synchronize_between_processes`` to all-reduce count/total.
    """

    def __init__(self, window_size: int = 20, fmt: str = "{median:.6f} ({global_avg:.6f})"):
        self.deque: collections.deque = collections.deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1) -> None:
        self.deque.append(value)
        self.count += n
        self.total += value * n

    def synchronize_between_processes(self) -> None:
        import jax

        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        arr = multihost_utils.process_allgather(
            np.asarray([self.count, self.total], np.float64))
        self.count = int(arr[:, 0].sum())
        self.total = float(arr[:, 1].sum())

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(1, self.count)

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self) -> str:
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, max=self.max,
                               value=self.value)


class MetricLogger:
    """Iteration logger (dino-main/utils.py:276-400)."""

    def __init__(self, delimiter: str = "  ", printer=print):
        self.meters: dict[str, SmoothedValue] = collections.defaultdict(
            SmoothedValue)
        self.delimiter = delimiter
        self.printer = printer

    def update(self, **kwargs) -> None:
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        # look in __dict__ directly: during unpickling/deepcopy this runs
        # before __init__ populated the instance, and touching self.meters
        # would re-enter __getattr__ forever
        meters = self.__dict__.get("meters")
        if meters is not None and attr in meters:
            return meters[attr]
        raise AttributeError(attr)

    def synchronize_between_processes(self) -> None:
        for meter in self.meters.values():
            meter.synchronize_between_processes()

    def __str__(self) -> str:
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items())

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: str = ""):
        i = 0
        start = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.6f}")
        data_time = SmoothedValue(fmt="{avg:.6f}")
        try:
            total = len(iterable)  # type: ignore[arg-type]
        except TypeError:
            total = None
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 or (total and i == total - 1):
                eta = ""
                if total:
                    eta_s = iter_time.global_avg * (total - i)
                    eta = f"eta: {datetime.timedelta(seconds=int(eta_s))}  "
                self.printer(
                    f"{header} [{i}{'/' + str(total) if total else ''}]  "
                    f"{eta}{self}  time: {iter_time}  data: {data_time}")
            i += 1
            end = time.time()
        self.printer(
            f"{header} Total time: "
            f"{datetime.timedelta(seconds=int(time.time() - start))}")


class LaggedFetch:
    """One-step-lagged async resolution of per-step device scalars.

    ``float(metrics["loss"])`` right after a train-step dispatch blocks
    the host for the full device round trip (30-50 ms per step on
    remote-attached chips).  ``push`` starts the d2h copy immediately but
    resolves the PREVIOUS step's values instead, so each fetch rides
    under the next step's compute; ``flush`` drains the last pending
    entry at loop end.  ``consume`` receives the (ready) metric tree.
    """

    def __init__(self, consume):
        self._consume = consume
        self._pending = None

    def push(self, tree) -> None:
        import jax

        for leaf in jax.tree.leaves(tree):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()
        if self._pending is not None:
            self._consume(self._pending)
        self._pending = tree

    def flush(self) -> None:
        if self._pending is not None:
            self._consume(self._pending)
            self._pending = None


class StepTimer:
    """Step-time + device-memory reporter; optional jax.profiler trace."""

    def __init__(self):
        self.times: list[float] = []
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else 0.0

    @staticmethod
    def device_memory_mb() -> float | None:
        """Peak device memory, when the backend exposes stats."""
        import jax

        try:
            stats = jax.local_devices()[0].memory_stats()
            if stats and "peak_bytes_in_use" in stats:
                return stats["peak_bytes_in_use"] / 1e6
        except Exception:  # noqa: BLE001 — stats are best-effort
            pass
        return None

    @staticmethod
    def trace(log_dir: str):
        """Context manager around jax.profiler.trace for chrome traces."""
        import jax

        return jax.profiler.trace(log_dir)
