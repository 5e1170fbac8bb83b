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
_ALLOWED_MODULES = ("numpy.dtypes",)


class _RestrictedUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if (module, name) in _ALLOWED or module in _ALLOWED_MODULES:
            return super().find_class(module, name)
        raise WirePayloadError(f"wire payload references forbidden type {module}.{name}")


def loads(data: bytes):
    """Deserialize an RPC payload, refusing non-whitelisted types."""
    return _RestrictedUnpickler(io.BytesIO(data)).load()
