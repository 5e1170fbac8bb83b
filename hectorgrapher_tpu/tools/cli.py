"""Command-line tools.

Replaces the reference's binaries (SURVEY.md section 2.11):
  * state info/migrate        (ref: io/pbstream_main.cc)
  * print-configuration       (ref: common/print_configuration_main.cc)
  * autogenerate-ground-truth (ref: ground_truth/autogenerate_ground_truth_main.cc)
  * ground-truth-from-mocap   (ref: ground_truth/generate_ground_truth_from_mocap_main.cc)
  * compute-relations-metrics (ref: ground_truth/compute_relations_metrics_main.cc)
  * scan-matching-evaluation  (ref: evaluation/scan_matching_evaluation.cc)
  * map-builder-server        (ref: cloud/map_builder_server_main.cc)

Usage: python -m hectorgrapher_tpu.tools.cli <subcommand> [args].
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def cmd_state_info(args) -> int:
    """(ref: pbstream_main.cc `info`)"""
    data = np.load(args.state, allow_pickle=False)
    index = json.loads(bytes(data["__index__"]).decode())
    trajectories = sorted(
        {e["trajectory_id"] for e in index["nodes"]} | {e["trajectory_id"] for e in index["submaps"]}
    )
    print(f"format version: {index['version']}")
    print(f"dimension: {index['dim']}D")
    print(f"nodes: {len(index['nodes'])}")
    print(f"submaps: {len(index['submaps'])}")
    print(f"constraints: {len(index['constraints'])}")
    inter = sum(1 for c in index["constraints"] if c["tag"] == "INTER")
    print(f"  inter (loop closure): {inter}")
    print(f"trajectories: {trajectories}")
    for t in trajectories:
        state = index["trajectory_states"].get(str(t), "?")
        n = sum(1 for e in index["nodes"] if e["trajectory_id"] == t)
        print(f"  trajectory {t}: {n} nodes, state {state}")
    return 0


def cmd_print_configuration(args) -> int:
    """(ref: print_configuration_main.cc — resolved options dump)"""
    from hectorgrapher_tpu.common import config as cfg

    options = cfg.MapBuilderOptions()
    if args.override:
        overrides = {}
        for item in args.override:
            key, _, value = item.partition("=")
            overrides[key] = json.loads(value)
        options = cfg.replace_deep(options, overrides)
    print(json.dumps(cfg.to_dict(options), indent=2, default=str))
    return 0


def cmd_autogenerate_ground_truth(args) -> int:
    from hectorgrapher_tpu.common.config import MapBuilderOptions
    from hectorgrapher_tpu.evaluation.metrics import autogenerate_relations_from_pose_graph
    from hectorgrapher_tpu.evaluation.relations_text_file import write_relations_text_file
    from hectorgrapher_tpu.io.serialization import load_state
    from hectorgrapher_tpu.mapping.pose_graph.pose_graph import PoseGraph2D, PoseGraph3D

    pg = PoseGraph3D(MapBuilderOptions().pose_graph)
    try:
        load_state(pg, args.state, load_frozen_state=False)
    except Exception:
        pg = PoseGraph2D(MapBuilderOptions().pose_graph)
        load_state(pg, args.state, load_frozen_state=False)
    relations = autogenerate_relations_from_pose_graph(
        pg,
        min_covered_distance=args.min_covered_distance,
        outlier_threshold_meters=args.outlier_threshold_meters,
        outlier_threshold_radians=args.outlier_threshold_radians,
    )
    write_relations_text_file(args.output, relations)
    print(f"wrote {len(relations)} relations to {args.output}")
    return 0


def cmd_ground_truth_from_mocap(args) -> int:
    """(ref: generate_ground_truth_from_mocap_main.cc:33-43 — CSV columns
    time,x,y,z,qw,qx,qy,qz; relations every pose_time_delta.)"""
    from hectorgrapher_tpu.evaluation.metrics import relations_from_ground_truth
    from hectorgrapher_tpu.evaluation.relations_text_file import write_relations_text_file
    from hectorgrapher_tpu.transform.np_quat import NpRigid3

    rows = np.loadtxt(args.csv, delimiter=",", skiprows=args.skip_rows)
    times = rows[:, 0]
    poses = [NpRigid3(r[1:4], r[4:8]) for r in rows]
    relations = relations_from_ground_truth(times, poses, args.pose_time_delta)
    write_relations_text_file(args.output, relations)
    print(f"wrote {len(relations)} relations to {args.output}")
    return 0


def cmd_compute_relations_metrics(args) -> int:
    from hectorgrapher_tpu.evaluation.metrics import TrajectoryInterpolator, compute_relation_metrics
    from hectorgrapher_tpu.evaluation.relations_text_file import read_relations_text_file
    from hectorgrapher_tpu.transform.np_quat import NpRigid3

    relations = read_relations_text_file(args.relations)
    data = np.load(args.state, allow_pickle=False)
    index = json.loads(bytes(data["__index__"]).decode())
    times = [e["time"] for e in index["nodes"]]
    poses = [
        NpRigid3(data[f"node{i}_global"][:3], data[f"node{i}_global"][3:7])
        for i in range(len(index["nodes"]))
    ]
    metrics = compute_relation_metrics(TrajectoryInterpolator(times, poses), relations)
    print(metrics)
    return 0


def cmd_scan_matching_evaluation(args) -> int:
    """(ref: evaluation/scan_matching_evaluation.cc — synthetic scans,
    matcher benchmarking with perturbed initial poses.)"""
    import time as _time

    import jax
    import jax.numpy as jnp

    from hectorgrapher_tpu.common.config import ProbabilityGridRangeDataInserterOptions2D
    from hectorgrapher_tpu.evaluation.scan_generator import raycast_rect_room_2d
    from hectorgrapher_tpu.mapping.grids import make_probability_grid
    from hectorgrapher_tpu.mapping.inserters_2d import make_probability_inserter_2d
    from hectorgrapher_tpu.mapping.scan_matching.correlative_2d import (
        make_search_window,
        match_correlative_2d,
    )
    from hectorgrapher_tpu.mapping.scan_matching.gn_2d import match_gn_2d_probability
    from hectorgrapher_tpu.sensor.types import RangeData, pad_cloud
    from hectorgrapher_tpu.transform.rigid import Rigid2

    rng = np.random.default_rng(args.seed)
    grid = make_probability_grid(0.05, (512, 512))
    insert = make_probability_inserter_2d(
        ProbabilityGridRangeDataInserterOptions2D(), max_range=12.8, resolution=0.05
    )
    pts = raycast_rect_room_2d(np.zeros(2), 0.0, num_rays=1440)
    pts = pts[~np.isnan(pts[:, 0])]
    cloud = pad_cloud(pts.astype(np.float32), 2048)
    grid = insert(
        grid,
        RangeData(origin=jnp.zeros(3, jnp.float32), returns=cloud,
                  misses=pad_cloud(np.zeros((0, 3), np.float32), 8)),
    )
    window = make_search_window(0.3, np.radians(20.0), 0.05, 12.0)

    errors, times = [], []
    for trial in range(args.num_trials):
        offset = rng.uniform(-0.2, 0.2, 2)
        angle = rng.uniform(-0.15, 0.15)
        initial = Rigid2(
            translation=jnp.asarray(offset, jnp.float32), angle=jnp.asarray(angle, jnp.float32)
        )
        t0 = _time.perf_counter()
        _, coarse = match_correlative_2d(grid, cloud, initial, window, 0.1, 0.1)
        pose, _ = match_gn_2d_probability(
            grid, cloud, coarse, initial.translation, 1.0, 10.0, 40.0, num_iterations=10
        )
        jax.block_until_ready(pose)
        times.append(_time.perf_counter() - t0)
        errors.append(float(jnp.linalg.norm(pose.translation)))
    print(f"trials: {args.num_trials}")
    print(f"mean translation error: {np.mean(errors):.4f} m (max {np.max(errors):.4f})")
    print(f"mean match time: {np.mean(times[1:]) * 1e3:.2f} ms")
    return 0


def cmd_map_builder_server(args) -> int:
    """(ref: cloud/map_builder_server_main.cc)"""
    import time as _time

    from hectorgrapher_tpu.common import config as cfg
    from hectorgrapher_tpu.cloud.server import MapBuilderServer
    from hectorgrapher_tpu.mapping.map_builder import MapBuilder

    options = cfg.replace_deep(
        cfg.MapBuilderOptions(),
        {"use_trajectory_builder_2d": not args.use_3d, "use_trajectory_builder_3d": args.use_3d},
    )
    server = MapBuilderServer(MapBuilder(options), args.address)
    server.start()
    print(f"map builder server listening on port {server.port}")
    try:
        while True:
            _time.sleep(1.0)
    except KeyboardInterrupt:
        server.shutdown()
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="hectorgrapher_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("state-info", help="inspect a serialized state file")
    p.add_argument("state")
    p.set_defaults(fn=cmd_state_info)

    p = sub.add_parser("print-configuration", help="dump resolved options")
    p.add_argument("--override", action="append", help="dotted.key=json_value")
    p.set_defaults(fn=cmd_print_configuration)

    p = sub.add_parser("autogenerate-ground-truth")
    p.add_argument("state")
    p.add_argument("output")
    p.add_argument("--min_covered_distance", type=float, default=100.0)
    p.add_argument("--outlier_threshold_meters", type=float, default=0.15)
    p.add_argument("--outlier_threshold_radians", type=float, default=0.02)
    p.set_defaults(fn=cmd_autogenerate_ground_truth)

    p = sub.add_parser("ground-truth-from-mocap")
    p.add_argument("csv")
    p.add_argument("output")
    p.add_argument("--pose_time_delta", type=float, default=0.1)
    p.add_argument("--skip_rows", type=int, default=0)
    p.set_defaults(fn=cmd_ground_truth_from_mocap)

    p = sub.add_parser("compute-relations-metrics")
    p.add_argument("state")
    p.add_argument("relations")
    p.set_defaults(fn=cmd_compute_relations_metrics)

    p = sub.add_parser("scan-matching-evaluation")
    p.add_argument("--num_trials", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_scan_matching_evaluation)

    p = sub.add_parser("map-builder-server")
    p.add_argument("--address", default="127.0.0.1:50051")
    p.add_argument("--use_3d", action="store_true")
    p.set_defaults(fn=cmd_map_builder_server)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
