"""Multi-host solver plane: leader/follower execution of sharded solves.

Topology (SURVEY §2.12 #3; VERDICT r2 #5): every host joins one
jax.distributed coordination service (parallel/multihost.py) and
contributes its devices to the global mesh. The gRPC sensor edge and the
pose-graph HOST state live on the LEADER process — the reference's
uplink-server role (ref: cloud/internal/map_builder_server.cc:157-176,
one process owns the global pose graph) — while every FOLLOWER process
runs a `SolverPlane` service executing the same sharded device program
whenever the leader reaches one, so the psum/all_gather collectives line
up across all hosts' devices.

Why leader-driven instead of fully-replicated SPMD serving: sensor
ingestion and loop-closure bookkeeping are irregular host work with no
collective structure; replicating them in lockstep across hosts buys
nothing. The solver plane ships ONE problem-sized payload per solve
(numpy pytrees over the restricted wire codec) and gets every host's
chips for the O(C) constraint assembly — the part that scales.

The payloads are passed as NUMPY pytrees on every process: in
multi-controller JAX, identical host-local numpy inputs to a jitted
program over the global mesh are treated as replicated global values;
process-local device arrays would be rejected.
"""

from __future__ import annotations

import threading
from concurrent import futures
from typing import Callable, List, Optional

import numpy as np

from hectorgrapher_tpu.cloud import wire

SERVICE = "hectorgrapher.SolverPlane"


def _solve(op: str, payload) -> None:
    import jax

    from hectorgrapher_tpu.parallel.multihost import global_mesh
    from hectorgrapher_tpu.parallel.sharded import (
        solve_spa_2d_sharded,
        solve_spa_3d_sharded,
    )

    mesh = global_mesh()
    if op == "spa2d":
        problem, iters = payload
        jax.block_until_ready(solve_spa_2d_sharded(problem, mesh, num_iterations=iters))
    elif op == "spa3d":
        problem, iters = payload
        jax.block_until_ready(solve_spa_3d_sharded(problem, mesh, num_iterations=iters))
    else:
        raise ValueError(f"unknown solver-plane op {op!r}")


class SolverPlaneFollower:
    """gRPC service run by every non-leader process: executes the leader's
    sharded solves so the global-mesh collectives complete."""

    def __init__(self, address: str = "127.0.0.1:0"):
        import grpc

        self._shutdown = threading.Event()
        self._server = grpc.server(futures.ThreadPoolExecutor(max_workers=4))

        def execute(request, context):
            op, payload = request
            if op == "shutdown":
                self._shutdown.set()
                return True
            _solve(op, payload)
            return True

        handler = grpc.unary_unary_rpc_method_handler(
            execute, request_deserializer=wire.loads, response_serializer=wire.dumps
        )
        self._server.add_generic_rpc_handlers(
            (grpc.method_handlers_generic_handler(SERVICE, {"Execute": handler}),)
        )
        self.port = self._server.add_insecure_port(address)

    def start(self) -> "SolverPlaneFollower":
        self._server.start()
        return self

    def wait_for_shutdown(self, timeout: Optional[float] = None) -> bool:
        done = self._shutdown.wait(timeout)
        if done:
            self._server.stop(grace=1.0)
        return done


class SolverPlaneLeader:
    """Held by the leader's pose graph as its `broadcast` hook: ships each
    sharded solve's inputs to every follower, then the caller runs the
    same solve locally — all processes meet inside the collective."""

    def __init__(self, follower_addresses: List[str]):
        import grpc

        self._calls = []
        self._channels = []
        for addr in follower_addresses:
            channel = grpc.insecure_channel(addr)
            self._channels.append(channel)
            self._calls.append(
                channel.unary_unary(
                    f"/{SERVICE}/Execute",
                    request_serializer=wire.dumps,
                    response_deserializer=wire.loads,
                    _registered_method=False,
                )
            )
        self._pending: List[object] = []

    def __call__(self, op: str, payload) -> None:
        """Fire-and-proceed: the leader enters its own solve immediately;
        the follower joins the collective when the RPC lands. Errors from
        the previous round surface here (a dead follower would otherwise
        hang the mesh silently)."""
        for f in self._pending:
            exc = f.exception(timeout=0) if f.done() else None
            if exc is not None:
                raise RuntimeError(f"solver-plane follower failed: {exc}")
        self._pending = [call.future((op, payload)) for call in self._calls]

    def shutdown(self) -> None:
        for f in self._pending:
            try:
                f.result(timeout=30)
            except Exception:
                pass
        for call in self._calls:
            try:
                call(("shutdown", None), timeout=10)
            except Exception:
                pass
        for channel in self._channels:
            channel.close()
