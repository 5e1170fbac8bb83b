"""Multi-host solver plane: leader/follower execution of sharded solves.

Topology (SURVEY §2.12 #3; VERDICT r2 #5, r3 #1): every host joins one
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
nothing. The solver plane ships problem-sized payloads (numpy pytrees
over the restricted wire codec) and gets every host's chips for the O(C)
work — the parts that scale.

Ops (every collective program the production pose graph launches):
  spa2d / spa3d      — sharded SPA solves (payload: problem pytree, iters)
  cs2d_pack/cs3d_pack — extend the follower's device-resident pack of
                        finished-submap matcher state (payload: full slot
                        order + host arrays for newly finished submaps;
                        finished grids are immutable so each ships once)
  cs2d / cs3d        — one batched loop-closure round (payload: the
                        exact candidate arrays the leader launches with)

The payloads are passed as NUMPY pytrees on every process: in
multi-controller JAX, identical host-local numpy inputs to a jitted
program over the global mesh are treated as replicated global values;
process-local device arrays would be rejected. (Pack payloads could be
trimmed per follower to the slots its devices own — device_put only
materializes addressable shards — but the broadcast keeps one payload.)

Ordering: ops carry a leader-assigned sequence number and the follower
executes strictly in sequence — two gRPC handler threads must never
enqueue collective programs in an order different from the leader's
launch order, or the meshes' program queues diverge and deadlock.
"""

from __future__ import annotations

import threading
import time
from concurrent import futures
from typing import List, Optional

import numpy as np

from hectorgrapher_tpu.cloud import wire

SERVICE = "hectorgrapher.SolverPlane"

import os as _os

_DEBUG = _os.environ.get("HG_SOLVER_PLANE_DEBUG") == "1"


class _PackState:
    """Follower-side mirror of the leader's device-resident constraint-
    search packs (PoseGraph2D._packs2d[depth] / PoseGraph3D._pack3d)."""

    def __init__(self):
        self.host = {}  # sid -> host arrays
        self.order: List[int] = []
        self.packed = None
        self.meta = {}


class SolverState:
    def __init__(self):
        self.pack2d: dict = {}  # depth -> _PackState (local vs full-submap rounds)
        self.pack3d = _PackState()


def execute_op(op: str, payload, state: SolverState) -> None:
    """Run one solver-plane op. The leader runs the same collective
    programs through its pose graph; followers run them here."""
    import jax

    from hectorgrapher_tpu.parallel.multihost import global_mesh

    mesh = global_mesh()
    if op == "spa2d":
        from hectorgrapher_tpu.parallel.sharded import solve_spa_2d_sharded

        problem, iters = payload
        jax.block_until_ready(solve_spa_2d_sharded(problem, mesh, num_iterations=iters))
    elif op == "spa3d":
        from hectorgrapher_tpu.parallel.sharded import solve_spa_3d_sharded

        problem, iters = payload
        jax.block_until_ready(solve_spa_3d_sharded(problem, mesh, num_iterations=iters))
    elif op == "cs2d_pack":
        from hectorgrapher_tpu.parallel.constraint_search import (
            pack_submaps_2d_from_arrays,
        )

        st = state.pack2d.setdefault(payload["depth"], _PackState())
        st.host.update(payload["new"])
        st.order = list(payload["order"])
        st.host = {sid: st.host[sid] for sid in st.order}
        st.meta = {"res": payload["res"], "dims": tuple(payload["dims"])}
        st.packed = pack_submaps_2d_from_arrays(
            [(st.host[sid]["levels"], st.host[sid]["mc"]) for sid in st.order],
            st.meta["res"],
            st.meta["dims"],
            mesh,
        )
    elif op == "cs2d":
        from hectorgrapher_tpu.mapping.scan_matching.fast_correlative_2d import (
            FastSearchConfig,
        )
        from hectorgrapher_tpu.parallel.constraint_search import launch_fast_matches_2d

        st = state.pack2d.get(payload["depth"])
        if st is None or st.packed is None:
            raise RuntimeError("cs2d before any cs2d_pack at this depth")
        out = launch_fast_matches_2d(
            st.packed,
            payload["arrays"],
            FastSearchConfig(*payload["config"]),
            mesh,
        )
        jax.block_until_ready(out)
    elif op == "cs3d_pack":
        from hectorgrapher_tpu.parallel.constraint_search import (
            pack_submaps_3d_from_arrays,
        )

        st = state.pack3d
        st.host.update(payload["new"])
        st.order = list(payload["order"])
        st.host = {sid: st.host[sid] for sid in st.order}
        st.packed = pack_submaps_3d_from_arrays(
            [st.host[sid] for sid in st.order], mesh
        )
    elif op == "cs3d":
        from hectorgrapher_tpu.mapping.scan_matching.fast_correlative_3d import (
            FastSearch3DConfig,
        )
        from hectorgrapher_tpu.parallel.constraint_search import launch_fast_matches_3d

        if state.pack3d.packed is None:
            raise RuntimeError("cs3d before any cs3d_pack")
        out = launch_fast_matches_3d(
            state.pack3d.packed,
            payload["arrays"],
            FastSearch3DConfig(*payload["config"]),
            mesh,
            use_rotational=bool(payload["use_rotational"]),
        )
        jax.block_until_ready(out)
    else:
        raise ValueError(f"unknown solver-plane op {op!r}")


class SolverPlaneFollower:
    """gRPC service run by every non-leader process: executes the leader's
    sharded solves so the global-mesh collectives complete."""

    def __init__(self, address: str = "127.0.0.1:0"):
        import grpc

        self._shutdown = threading.Event()
        self._server = grpc.server(futures.ThreadPoolExecutor(max_workers=4))
        self._state = SolverState()
        # Strict sequence execution (see module docstring): handler threads
        # wait their turn so device programs enqueue in the leader's order.
        self._seq_lock = threading.Lock()
        self._seq_cv = threading.Condition(self._seq_lock)
        self._next_seq = 0

        def execute(request, context):
            op, seq, payload = request
            if _DEBUG:
                print(f"solver-plane recv op={op} seq={seq}", flush=True)
            if op == "shutdown":
                self._shutdown.set()
                return True
            with self._seq_cv:
                while seq != self._next_seq:
                    if not self._seq_cv.wait(timeout=300.0):
                        raise RuntimeError(
                            f"solver-plane seq stall: waiting for {self._next_seq}, got {seq}"
                        )
                try:
                    execute_op(op, payload, self._state)
                except Exception:
                    # Surface in the follower's log too: the leader only
                    # sees the error on its NEXT broadcast, and a silent
                    # handler failure reads as a mesh hang.
                    import traceback

                    traceback.print_exc()
                    raise
                finally:
                    self._next_seq = seq + 1
                    self._seq_cv.notify_all()
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

    def __init__(self, follower_addresses: List[str], collect_stats: bool = False):
        import grpc

        self._calls = []
        self._channels = []
        self._seq = 0
        # Per-op overhead record (VERDICT r4 next #7): payload bytes +
        # ship/ack wall times. Opt-in — measuring bytes re-serializes the
        # payload, which doubles the host cost of multi-MB pack ops.
        self.stats: Optional[dict] = {} if collect_stats else None
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

    def __call__(self, op: str, payload, wait: bool = False) -> None:
        """Fire-and-proceed: the leader enters its own solve immediately;
        the follower joins the collective when the RPC lands. Errors from
        earlier ops surface here (a dead follower would otherwise hang the
        mesh silently). In-flight futures are RETAINED until completion:
        grpc cancels an RPC whose call object is garbage-collected, so
        dropping a pending future would cancel the op mid-flight (the
        round-4 bug: the pack op vanished when the round op replaced it,
        and the follower stalled waiting for the missing sequence number).

        wait=True blocks until every follower completed the op — used for
        PACK ops: a pack failure on a follower (wire cap, shape drift)
        must surface HERE, because the subsequent round op's collective
        would hang the leader's readback with no error path."""
        still = []
        for f in self._pending:
            if f.done():
                exc = f.exception(timeout=0)
                if exc is not None:
                    raise RuntimeError(f"solver-plane follower failed: {exc}")
            else:
                still.append(f)
        seq = self._seq
        self._seq += 1
        st = None
        if self.stats is not None:
            st = self.stats.setdefault(
                op, {"count": 0, "bytes": 0, "ack_ms": []}
            )
            st["count"] += 1
            st["bytes"] += len(wire.dumps((op, seq, payload)))
        t0 = time.perf_counter()
        futures_now = [call.future((op, seq, payload)) for call in self._calls]
        if st is not None:
            for f in futures_now:
                f.add_done_callback(
                    lambda _f, st=st, t0=t0: st["ack_ms"].append(
                        (time.perf_counter() - t0) * 1e3
                    )
                )
        if wait:
            for f in futures_now:
                try:
                    f.result(timeout=300)
                except Exception as exc:
                    raise RuntimeError(
                        f"solver-plane follower failed on {op}: {exc}"
                    ) from exc
        else:
            still.extend(futures_now)
        self._pending = still

    def shutdown(self) -> None:
        for f in self._pending:
            try:
                f.result(timeout=30)
            except Exception:
                pass
        for call in self._calls:
            try:
                call(("shutdown", 0, None), timeout=10)
            except Exception:
                pass
        for channel in self._channels:
            channel.close()
