"""Wire (de)serialization for the RPC layer: pickle with a restricted
unpickler.

The reference speaks protobuf (cloud/proto/map_builder_service.proto);
this build keeps pickle's zero-codegen convenience for the private-cluster
data plane but removes its arbitrary-code-execution property: `loads`
refuses to resolve any class outside an explicit whitelist of data-only
containers (numpy/jax array reconstruction + this framework's sensor and
transform value types). A hostile peer reaching the port can therefore
send malformed data, but cannot make the server import or call anything
else (the classic `__reduce__` → `os.system` pickle exploit fails with
WirePayloadError).
"""

from __future__ import annotations

import io
import pickle

dumps = pickle.dumps


class WirePayloadError(Exception):
    """A wire payload referenced a type outside the whitelist."""


_ALLOWED = {
    # numpy array/scalar reconstruction (module path moved in numpy 2.x).
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "scalar"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    # jax.Array pickles via this data-only reconstruction helper.
    ("jax._src.array", "_reconstruct_array"),
    # Framework value types that cross the RPC boundary.
    ("hectorgrapher_tpu.transform.np_quat", "NpRigid3"),
    ("hectorgrapher_tpu.sensor.types", "PointCloud"),
    ("hectorgrapher_tpu.sensor.types", "TimedPointCloud"),
    ("hectorgrapher_tpu.sensor.types", "TimedPointCloudData"),
    ("hectorgrapher_tpu.sensor.types", "RangeData"),
    ("hectorgrapher_tpu.sensor.types", "ImuData"),
    ("hectorgrapher_tpu.sensor.types", "ImuSeries"),
    ("hectorgrapher_tpu.sensor.types", "OdometryData"),
    ("hectorgrapher_tpu.sensor.types", "FixedFramePoseData"),
    ("hectorgrapher_tpu.sensor.types", "LandmarkObservation"),
    ("hectorgrapher_tpu.sensor.types", "LandmarkData"),
    # Result-based federation payloads (cloud/local_slam_result.py).
    ("hectorgrapher_tpu.cloud.local_slam_result", "LocalSlamResultPayload"),
    ("hectorgrapher_tpu.cloud.local_slam_result", "SubmapPayload"),
    # Solver-plane payloads (cloud/solver_plane.py): SPA problem pytrees.
    ("hectorgrapher_tpu.mapping.pose_graph.optimization", "SpaProblem2D"),
    ("hectorgrapher_tpu.mapping.pose_graph.optimization", "SpaProblem3D"),
    # Builtin value containers that pickle via find_class.
    ("builtins", "complex"),
    ("builtins", "set"),
    ("builtins", "frozenset"),
    ("builtins", "bytearray"),
    ("builtins", "slice"),
    ("builtins", "range"),
}

# numpy 2 dtype classes (numpy.dtypes.Float64DType, ...) appear in pickles
# of structured dtypes; they are data-only descriptors.
_ALLOWED_MODULES = ("numpy.dtypes", "ml_dtypes")


class _RestrictedUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if (module, name) in _ALLOWED or module in _ALLOWED_MODULES:
            return super().find_class(module, name)
        raise WirePayloadError(f"wire payload references forbidden type {module}.{name}")


# Sanity caps on decoded payloads (VERDICT r2 #10). numpy's __setstate__
# already rejects shape/buffer mismatches, so a pickle cannot allocate more
# array memory than it ships — the residual amplification vectors are
# pointer fan-out (a small stream building huge containers of repeated
# references) and unbounded nesting. Both are capped after decode; the raw
# payload size is capped before it.
MAX_WIRE_BYTES = 256 * 1024 * 1024
MAX_TOTAL_ARRAY_BYTES = 1024 * 1024 * 1024
MAX_ARRAY_NDIM = 8
MAX_CONTAINER_LEN = 1 << 24
MAX_DEPTH = 64


def _validate(obj) -> None:
    import numpy as _np

    total_array_bytes = 0
    stack = [(obj, 0)]
    while stack:
        value, depth = stack.pop()
        if depth > MAX_DEPTH:
            raise WirePayloadError("wire payload nesting exceeds MAX_DEPTH")
        if isinstance(value, _np.ndarray):
            if value.ndim > MAX_ARRAY_NDIM:
                raise WirePayloadError(f"array ndim {value.ndim} > {MAX_ARRAY_NDIM}")
            total_array_bytes += value.nbytes
            if total_array_bytes > MAX_TOTAL_ARRAY_BYTES:
                raise WirePayloadError("wire payload array bytes exceed cap")
        elif isinstance(value, dict):
            if len(value) > MAX_CONTAINER_LEN:
                raise WirePayloadError("wire payload container too large")
            stack.extend((v, depth + 1) for v in value.values())
            stack.extend((k, depth + 1) for k in value.keys())
        elif isinstance(value, (list, tuple, set, frozenset)):
            if len(value) > MAX_CONTAINER_LEN:
                raise WirePayloadError("wire payload container too large")
            stack.extend((v, depth + 1) for v in value)
        elif hasattr(value, "_fields") and isinstance(value, tuple):  # NamedTuple
            stack.extend((v, depth + 1) for v in value)
        elif hasattr(value, "__dict__") and type(value).__module__.startswith(
            "hectorgrapher_tpu"
        ):
            stack.extend((v, depth + 1) for v in vars(value).values())


def loads(data: bytes):
    """Deserialize an RPC payload, refusing non-whitelisted types,
    oversized messages, and decoded structures past the sanity caps."""
    if len(data) > MAX_WIRE_BYTES:
        raise WirePayloadError(
            f"wire payload {len(data)} bytes exceeds MAX_WIRE_BYTES"
        )
    obj = _RestrictedUnpickler(io.BytesIO(data)).load()
    _validate(obj)
    return obj
