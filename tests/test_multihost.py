"""Multi-host solver plane, hermetically: two REAL processes on localhost
(SURVEY §4 "multi-node without a cluster"; ref: the reference's
client_server_test.cc starts real servers in-process — here the analog is
two jax.distributed processes forming one global mesh)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import numpy as np

proc_id = int(sys.argv[1])
coord = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=4"
os.environ.setdefault("JAX_ENABLE_X64", "1")

sys.path.insert(0, os.getcwd())

import jax

jax.config.update("jax_platforms", "cpu")
# Join the coordination service BEFORE any backend/device use — the same
# ordering a production main must follow (parallel/multihost.py docs).
jax.distributed.initialize(coordinator_address=coord, num_processes=2, process_id=proc_id)

from hectorgrapher_tpu.parallel.multihost import global_mesh

assert jax.process_count() == 2, jax.process_count()
mesh = global_mesh()
assert len(mesh.devices.ravel()) == 8, mesh

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

# A representative solver-plane computation: globally-sharded residual
# reduction (the core pattern of the sharded SPA normal equations) on an
# array sharded over BOTH hosts' devices.
rows = 64
global_shape = (rows, 16)
data = np.arange(rows * 16, dtype=np.float32).reshape(global_shape)
sharding = NamedSharding(mesh, P("graph"))
arr = jax.make_array_from_process_local_data(sharding, data[proc_id * 32 : (proc_id + 1) * 32])

@jax.jit
def total(a):
    return jnp.sum(a * a)

out = float(total(arr))
expected = float(np.sum(data.astype(np.float64) ** 2))
assert abs(out - expected) / expected < 1e-6, (out, expected)

# The sharded SPA itself over the global mesh.
from tests.test_sharded import build_problem
from hectorgrapher_tpu.parallel.sharded import solve_spa_2d_sharded

rng = np.random.default_rng(0)
problem, gt_sub, gt_node = build_problem(rng)
sub_s, node_s, cost = solve_spa_2d_sharded(problem, mesh, num_iterations=20)
err = float(jnp.max(jnp.abs(np.asarray(node_s)[:, :2] - gt_node[:, :2])))
assert err < 0.05, err
print(f"proc {proc_id} OK err={err:.2e}")
"""


@pytest.mark.skipif(
    os.environ.get("HG_SKIP_MULTIPROCESS") == "1",
    reason="multi-process test disabled",
)
def test_two_process_global_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), coord],
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, out[-3000:]
    assert "proc 0 OK" in outs[0][1] and "proc 1 OK" in outs[1][1]
