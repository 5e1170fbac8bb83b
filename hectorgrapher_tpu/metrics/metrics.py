"""Metrics instrumentation interfaces.

(ref: cartographer/metrics/{counter,gauge,histogram,family_factory}.h —
dependency-free Counter/Gauge/Histogram interfaces with Null
implementations so the library runs un-instrumented, Family<T> keyed by
label maps, RegisterAllMetrics wiring; the Prometheus implementation in
cloud/metrics/prometheus/ becomes the TextFormat exporter here.)
"""

from __future__ import annotations

import math
import threading
import time
from typing import Dict, List, Optional, Sequence, Tuple


class Counter:
    """(ref: metrics/counter.h)"""

    def __init__(self):
        self._value = 0.0
        self._lock = threading.Lock()

    def increment(self, by_value: float = 1.0) -> None:
        with self._lock:
            self._value += by_value

    @property
    def value(self) -> float:
        return self._value


class Gauge:
    """(ref: metrics/gauge.h)"""

    def __init__(self):
        self._value = 0.0
        self._lock = threading.Lock()

    def set(self, value: float) -> None:
        with self._lock:
            self._value = value

    def increment(self, by_value: float = 1.0) -> None:
        with self._lock:
            self._value += by_value

    def decrement(self, by_value: float = 1.0) -> None:
        self.increment(-by_value)

    @property
    def value(self) -> float:
        return self._value


class Histogram:
    """(ref: metrics/histogram.h — fixed or scaled bucket boundaries)"""

    def __init__(self, boundaries: Sequence[float]):
        self._boundaries = list(boundaries)
        self._counts = [0] * (len(self._boundaries) + 1)
        self._sum = 0.0
        self._lock = threading.Lock()

    @staticmethod
    def fixed_width(width: float, num_buckets: int) -> "Histogram":
        return Histogram([width * (i + 1) for i in range(num_buckets)])

    @staticmethod
    def scaled_powers_of(base: float, scale_factor: float, max_value: float) -> "Histogram":
        assert base > 1.0, "scaled_powers_of requires base > 1 (ref: histogram.h CHECK)"
        bounds = []
        v = scale_factor
        while v < max_value:
            bounds.append(v)
            v *= base
        return Histogram(bounds)

    def observe(self, value: float) -> None:
        with self._lock:
            self._sum += value
            for i, b in enumerate(self._boundaries):
                if value <= b:
                    self._counts[i] += 1
                    return
            self._counts[-1] += 1

    @property
    def counts_by_bucket(self) -> List[int]:
        return list(self._counts)

    @property
    def sum(self) -> float:
        return self._sum


class NullCounter(Counter):
    def increment(self, by_value: float = 1.0) -> None:
        pass


class NullGauge(Gauge):
    def set(self, value: float) -> None:
        pass

    def increment(self, by_value: float = 1.0) -> None:
        pass


class NullHistogram(Histogram):
    def __init__(self):
        super().__init__([])

    def observe(self, value: float) -> None:
        pass


class Family:
    """Labelled metric family (ref: metrics/family_factory.h Family<T>)."""

    def __init__(self, name: str, description: str, factory):
        self.name = name
        self.description = description
        self._factory = factory
        self._metrics: Dict[Tuple[Tuple[str, str], ...], object] = {}
        self._lock = threading.Lock()

    def add(self, labels: Optional[Dict[str, str]] = None):
        key = tuple(sorted((labels or {}).items()))
        # Lock: front-end and the async pose-graph worker may register the
        # same label set concurrently; a check-then-set race would hand one
        # thread a metric instance that text_format never sees.
        with self._lock:
            if key not in self._metrics:
                self._metrics[key] = self._factory()
            return self._metrics[key]

    def items(self):
        return [(dict(k), v) for k, v in self._metrics.items()]


class FamilyFactory:
    """(ref: metrics/family_factory.h; the default registry is a real
    implementation rather than Null — instrumentation is cheap here.)"""

    def __init__(self):
        self._families: List[Family] = []

    def new_counter_family(self, name: str, description: str) -> Family:
        f = Family(name, description, Counter)
        self._families.append(f)
        return f

    def new_gauge_family(self, name: str, description: str) -> Family:
        f = Family(name, description, Gauge)
        self._families.append(f)
        return f

    def new_histogram_family(self, name: str, description: str, boundaries: Sequence[float]) -> Family:
        f = Family(name, description, lambda: Histogram(boundaries))
        self._families.append(f)
        return f

    def text_format(self) -> str:
        """Prometheus text exposition (ref: cloud/metrics/prometheus/)."""
        lines = []
        for fam in self._families:
            lines.append(f"# HELP {fam.name} {fam.description}")
            for labels, metric in fam.items():
                label_str = ",".join(f'{k}="{v}"' for k, v in labels.items())
                label_part = "{" + label_str + "}" if label_str else ""
                if isinstance(metric, Histogram):
                    lines.append(f"{fam.name}_sum{label_part} {metric.sum}")
                    # Prometheus buckets are CUMULATIVE and carry the
                    # family's labels alongside `le`.
                    counts = metric.counts_by_bucket
                    total = 0
                    for b, c in zip(list(metric._boundaries) + ["+Inf"], counts):
                        total += c
                        le = f'le="{b}"'
                        joined = f"{{{label_str},{le}}}" if label_str else f"{{{le}}}"
                        lines.append(f"{fam.name}_bucket{joined} {total}")
                    lines.append(f"{fam.name}_count{label_part} {total}")
                else:
                    lines.append(f"{fam.name}{label_part} {metric.value}")
        return "\n".join(lines)


GLOBAL_FACTORY = FamilyFactory()


class RateTimer:
    """Event-rate estimator (ref: common/rate_timer.h RateTimer — pulses in
    a sliding window; used for per-sensor rate logging,
    collated_trajectory_builder.cc:66-84)."""

    def __init__(self, window_duration: float):
        from collections import deque

        self._window = window_duration
        self._events = deque()

    def pulse(self, time: float) -> None:
        self._events.append(time)
        while self._events and self._events[0] < time - self._window:
            self._events.popleft()  # O(1); list.pop(0) is O(n) at kHz rates

    def compute_rate(self) -> float:
        if len(self._events) < 2:
            return 0.0
        dt = self._events[-1] - self._events[0]
        return (len(self._events) - 1) / dt if dt > 0 else 0.0


class FixedRatioSampler:
    """Deterministic pulse sampler (ref: common/fixed_ratio_sampler.h)."""

    def __init__(self, ratio: float):
        assert 0.0 <= ratio <= 1.0
        self._ratio = ratio
        self._num_pulses = 0
        self._num_samples = 0

    def pulse(self) -> bool:
        self._num_pulses += 1
        if self._num_samples < self._ratio * self._num_pulses:
            self._num_samples += 1
            return True
        return False

    def debug_string(self) -> str:
        ratio = self._num_samples / self._num_pulses if self._num_pulses else 0.0
        return f"{self._num_samples} ({ratio:.2%})"


class ValueHistogram:
    """Score histogram for logging (ref: common/histogram.h Histogram —
    Add + ToString with bucketed bars)."""

    def __init__(self):
        self._values: List[float] = []

    def add(self, value: float) -> None:
        self._values.append(value)

    def to_string(self, buckets: int = 10) -> str:
        if not self._values:
            return "Count: 0"
        lo, hi = min(self._values), max(self._values)
        out = [f"Count: {len(self._values)}  Min: {lo:.6f}  Max: {hi:.6f}  Mean: {sum(self._values)/len(self._values):.6f}"]
        if hi == lo:
            return "\n".join(out)
        width = (hi - lo) / buckets
        counts = [0] * buckets
        for v in self._values:
            counts[min(int((v - lo) / width), buckets - 1)] += 1
        peak = max(counts)
        for i, c in enumerate(counts):
            bar = "#" * int(20 * c / peak)
            out.append(f"[{lo + i * width:9.3f}, {lo + (i + 1) * width:9.3f}) {bar}\tCount: {c} ({100*c/len(self._values):.2f}%)")
        return "\n".join(out)
