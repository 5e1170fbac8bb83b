"""Timestamped transform interpolation.

Host-side sorted pose buffer with device-friendly batched lookup
(ref: cartographer/transform/transform_interpolation_buffer.h, including
HectorGrapher's LookupUntilDelta used for adaptive control-point sampling,
transform_interpolation_buffer.h:76).
"""

from __future__ import annotations

import bisect
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from hectorgrapher_tpu.transform import np_quat as nq
from hectorgrapher_tpu.transform import rigid
from hectorgrapher_tpu.transform.rigid import Rigid3


def interpolate_stamped(time_a, pose_a: Rigid3, time_b, pose_b: Rigid3, time) -> Rigid3:
    """Interpolate between two stamped poses at `time`
    (ref: transform/timestamped_transform.cc Interpolate)."""
    denom = jnp.maximum(time_b - time_a, 1e-12)
    t = (time - time_a) / denom
    return rigid.interpolate(pose_a, pose_b, t)


class TransformInterpolationBuffer:
    """Sorted (time, pose) buffer with Lookup and LookupUntilDelta.

    Host-side structure: poses arrive sequentially from the extrapolator or
    odometry; lookups happen at scan timestamps. Stores numpy scalars to
    avoid device round-trips in the streaming path.
    """

    def __init__(self, buffer_size_limit: Optional[int] = None):
        self._times: List[float] = []
        self._translations: List[np.ndarray] = []
        self._rotations: List[np.ndarray] = []
        self._limit = buffer_size_limit

    def __len__(self) -> int:
        return len(self._times)

    @property
    def earliest_time(self) -> float:
        return self._times[0]

    @property
    def latest_time(self) -> float:
        return self._times[-1]

    def push(self, time: float, pose: Rigid3) -> None:
        t = np.asarray(pose.translation, dtype=np.float64)
        q = np.asarray(pose.rotation, dtype=np.float64)
        if self._times and time <= self._times[-1]:
            # Replace-or-ignore on out-of-order push, matching the
            # reference's CHECK-free tolerance in practice: drop stale.
            if time == self._times[-1]:
                self._translations[-1] = t
                self._rotations[-1] = q
            return
        self._times.append(time)
        self._translations.append(t)
        self._rotations.append(q)
        if self._limit is not None:
            while len(self._times) > self._limit:
                self._times.pop(0)
                self._translations.pop(0)
                self._rotations.pop(0)

    def has(self, time: float) -> bool:
        return bool(self._times) and self._times[0] <= time <= self._times[-1]

    def _bracket(self, time: float) -> Tuple[int, int]:
        idx = bisect.bisect_left(self._times, time)
        if idx == 0:
            return 0, 0
        if idx >= len(self._times):
            return len(self._times) - 1, len(self._times) - 1
        if self._times[idx] == time:
            return idx, idx
        return idx - 1, idx

    def lookup(self, time: float) -> Rigid3:
        """(ref: transform_interpolation_buffer.cc Lookup)

        Pure host-side numpy interpolation: one buffer lookup per odometry
        sample / control point in the streaming path, so device dispatch
        here (and f64 -> f32 truncation of the stored poses) would defeat
        the class's stated design. Returns a Rigid3 of numpy arrays —
        callers convert with NpRigid3.from_jax / np.asarray as before."""
        assert self.has(time), f"time {time} outside buffer [{self._times[0] if self._times else None}, {self._times[-1] if self._times else None}]"
        lo, hi = self._bracket(time)
        if lo == hi:
            return Rigid3(self._translations[lo], self._rotations[lo])
        t0, t1 = self._times[lo], self._times[hi]
        f = (time - t0) / max(t1 - t0, 1e-12)
        trans = self._translations[lo] + f * (self._translations[hi] - self._translations[lo])
        rot = nq.quat_slerp(self._rotations[lo], self._rotations[hi], f)
        return Rigid3(trans, rot)

    def lookup_until_delta(
        self,
        start_time: float,
        max_delta_translation: float,
        max_delta_rotation: float,
        min_delta_time: float,
        max_delta_time: float,
    ) -> Optional[float]:
        """Advance from start_time until translation/rotation/time threshold.

        Returns the first time > start_time at which any threshold is
        exceeded, or None if the buffer ends first. Drives ADAPTIVE
        control-point sampling (ref: transform_interpolation_buffer.cc
        LookupUntilDelta; used at optimizing_local_trajectory_builder.cc:1206).
        """
        if not self.has(start_time):
            return None
        start_pose = self.lookup(start_time)
        start_t = np.asarray(start_pose.translation)
        start_q = np.asarray(start_pose.rotation)
        idx = bisect.bisect_right(self._times, start_time)
        for i in range(idx, len(self._times)):
            dt = self._times[i] - start_time
            if dt < min_delta_time:
                continue
            if dt >= max_delta_time:
                return start_time + max_delta_time
            d_trans = float(np.linalg.norm(self._translations[i] - start_t))
            dot = float(np.abs(np.sum(self._rotations[i] * start_q)))
            d_rot = 2.0 * float(np.arccos(min(1.0, dot)))
            if d_trans > max_delta_translation or d_rot > max_delta_rotation:
                return self._times[i]
        return None
