"""Sensor infrastructure tests
(ref: ordered_multi_queue_test.cc, collator_test.cc,
trajectory_collator_test.cc, compressed_point_cloud_test.cc,
map_by_time_test.cc; metrics tests: common/fixed_ratio_sampler_test.cc,
common/rate_timer_test.cc)."""

import numpy as np
import pytest

from hectorgrapher_tpu.metrics.metrics import (
    Counter,
    FamilyFactory,
    FixedRatioSampler,
    Gauge,
    Histogram,
    RateTimer,
    ValueHistogram,
)
from hectorgrapher_tpu.sensor.collator import (
    Collator,
    MapByTime,
    OrderedMultiQueue,
    QueueKey,
    TrajectoryCollator,
)
from hectorgrapher_tpu.sensor.compression import compress, decompress


class TestOrderedMultiQueue:
    def test_ordering_across_queues(self):
        out = []
        q = OrderedMultiQueue()
        q.add_queue(QueueKey(0, "a"), lambda t, d: out.append(("a", t)))
        q.add_queue(QueueKey(0, "b"), lambda t, d: out.append(("b", t)))
        q.add(QueueKey(0, "a"), 1.0, None)
        q.add(QueueKey(0, "a"), 3.0, None)
        assert out == []  # queue b empty: nothing dispatched
        q.add(QueueKey(0, "b"), 2.0, None)
        # a@1.0 dispatched, then b@2.0 (both queues non-empty), then b empties
        assert out == [("a", 1.0), ("b", 2.0)]
        q.add(QueueKey(0, "b"), 4.0, None)
        assert out == [("a", 1.0), ("b", 2.0), ("a", 3.0)]
        q.flush()
        assert out == [("a", 1.0), ("b", 2.0), ("a", 3.0), ("b", 4.0)]

    def test_blocker(self):
        q = OrderedMultiQueue()
        q.add_queue(QueueKey(0, "a"), lambda t, d: None)
        q.add_queue(QueueKey(0, "b"), lambda t, d: None)
        q.add(QueueKey(0, "a"), 1.0, None)
        assert q.get_blocker() == QueueKey(0, "b")

    def test_finished_queue_does_not_block(self):
        out = []
        q = OrderedMultiQueue()
        q.add_queue(QueueKey(0, "a"), lambda t, d: out.append(t))
        q.add_queue(QueueKey(0, "b"), lambda t, d: out.append(t))
        q.mark_queue_as_finished(QueueKey(0, "b"))
        q.add(QueueKey(0, "a"), 1.0, None)
        assert out == [1.0]


class TestCollator:
    def test_cross_trajectory_ordering(self):
        out = []
        c = Collator()
        c.add_trajectory(0, ["lidar"], lambda s, t, d: out.append((0, s, t)))
        c.add_trajectory(1, ["lidar"], lambda s, t, d: out.append((1, s, t)))
        c.add_sensor_data(0, "lidar", 1.0, None)
        c.add_sensor_data(1, "lidar", 0.5, None)
        c.add_sensor_data(0, "lidar", 2.0, None)
        c.add_sensor_data(1, "lidar", 1.5, None)
        c.flush()
        times = [t for (_, _, t) in out]
        assert times == sorted(times)

    def test_trajectory_collator_independent(self):
        out = []
        c = TrajectoryCollator()
        c.add_trajectory(0, ["lidar"], lambda s, t, d: out.append((0, t)))
        c.add_trajectory(1, ["lidar"], lambda s, t, d: out.append((1, t)))
        c.add_sensor_data(0, "lidar", 5.0, None)
        # trajectory 1 empty does NOT block trajectory 0
        assert (0, 5.0) in out


class TestCompression:
    def test_round_trip_within_precision(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-50, 50, (500, 3)).astype(np.float32)
        stream, n = compress(pts)
        restored = decompress(stream, n)
        assert restored.shape == (500, 3)
        # order may change (block grouping); nearest-neighbor distances
        # must be within the quantization radius
        d2 = np.sum((pts[:, None, :] - restored[None, :, :]) ** 2, axis=-1)
        nn = np.sqrt(d2.min(axis=1))
        assert nn.max() < 0.001 * np.sqrt(3) / 2 + 1e-4, nn.max()

    def test_compression_ratio(self):
        rng = np.random.default_rng(1)
        # clustered points compress well
        pts = rng.normal(0, 0.2, (1000, 3)).astype(np.float32)
        stream, n = compress(pts)
        assert stream.nbytes < pts.nbytes / 2


class TestMapByTime:
    def test_append_and_query(self):
        m = MapByTime()
        m.append(0, 1.0, "a")
        m.append(0, 2.0, "b")
        m.append(1, 0.5, "c")
        assert m.trajectory(0) == [(1.0, "a"), (2.0, "b")]
        assert m.has_trajectory(1)
        with pytest.raises(AssertionError):
            m.append(0, 1.5, "out of order")


class TestMetrics:
    def test_counter_gauge(self):
        c = Counter()
        c.increment()
        c.increment(2.0)
        assert c.value == 3.0
        g = Gauge()
        g.set(5.0)
        g.decrement()
        assert g.value == 4.0

    def test_histogram_buckets(self):
        h = Histogram.fixed_width(1.0, 3)  # bounds 1,2,3
        for v in [0.5, 1.5, 2.5, 10.0]:
            h.observe(v)
        assert h.counts_by_bucket == [1, 1, 1, 1]

    def test_family_factory_text_format(self):
        f = FamilyFactory()
        fam = f.new_counter_family("test_total", "A test counter")
        fam.add({"kind": "x"}).increment()
        text = f.text_format()
        assert "test_total" in text and 'kind="x"' in text

    def test_fixed_ratio_sampler(self):
        s = FixedRatioSampler(0.25)
        hits = sum(s.pulse() for _ in range(100))
        assert hits == 25

    def test_rate_timer(self):
        rt = RateTimer(window_duration=10.0)
        for i in range(11):
            rt.pulse(i * 0.5)
        assert rt.compute_rate() == pytest.approx(2.0)

    def test_value_histogram(self):
        h = ValueHistogram()
        for v in [0.1, 0.5, 0.9]:
            h.add(v)
        s = h.to_string(buckets=2)
        assert "Count: 3" in s


class TestNativeBackend:
    def test_native_and_python_agree(self):
        """Native C++ core and pure-Python fallback dispatch identically."""
        import numpy as np

        rng = np.random.default_rng(0)
        results = {}
        for use_native in (True, False):
            out = []
            q = OrderedMultiQueue(use_native=use_native)
            q.add_queue(QueueKey(0, "a"), lambda t, d: out.append(("a", t, d)))
            q.add_queue(QueueKey(0, "b"), lambda t, d: out.append(("b", t, d)))
            q.add_queue(QueueKey(0, "c"), lambda t, d: out.append(("c", t, d)))
            rng2 = np.random.default_rng(42)
            streams = {s: np.sort(rng2.uniform(0, 10, 20)) for s in "abc"}
            idx = {s: 0 for s in "abc"}
            order = list("abc") * 20
            rng2.shuffle(order)
            for s in order:
                if idx[s] < 20:
                    q.add(QueueKey(0, s), float(streams[s][idx[s]]), idx[s])
                    idx[s] += 1
            q.flush()
            results[use_native] = out
        assert results[True] == results[False]
        times = [t for (_, t, _) in results[True]]
        assert times == sorted(times)
