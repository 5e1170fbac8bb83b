"""DRZ dress rehearsal (VERDICT r3 #9): a synthesized bag with the DRZ
sequences' exact shape — 10 Hz organized PointCloud2 with intensity/
ring/time fields (the Velodyne/Ouster layout the tracked-robot dataset
records), 100 Hz IMU, 20 Hz odometry, Qualisys-style mocap ground truth
next to the bag — runs end-to-end through `mapping-evaluation --use_3d`
(bag -> CT local SLAM -> pose graph -> ATE vs ground truth), so the real
sequences (ref: /root/reference/README.md:31-37) run unmodified the day
they are available."""

import numpy as np
import pytest

from hectorgrapher_tpu.io import rosbag
from hectorgrapher_tpu.transform import np_quat as nq
from hectorgrapher_tpu.transform.np_quat import NpRigid3

GRAVITY = np.array([0.0, 0.0, 9.80665])


def synthesize_drz_bag(path: str, mocap_path: str, duration: float = 2.0):
    """10 Hz organized scans (64 azimuth x 16 rings) around a slow drive,
    per-point times spanning the sweep, 100 Hz IMU, 20 Hz odometry."""
    from hectorgrapher_tpu.evaluation.scan_generator import raycast_box_room_3d

    rng = np.random.default_rng(7)
    speed = 0.25

    def gt(t):
        return np.array([speed * max(0.0, t - 0.6), 0.0, 0.0]), nq.quat_identity()

    msgs = []
    mocap_rows = []
    t = 0.0
    next_odom, next_scan = 0.0, 0.05
    while t <= duration:
        pt, q = gt(t)
        msgs.append(("/imu/data", "sensor_msgs/Imu", t, rosbag.encode_imu(
            t, nq.quat_rotate(nq.quat_conjugate(q), GRAVITY), np.zeros(3))))
        if t >= next_odom:
            msgs.append(("/odom", "nav_msgs/Odometry", t, rosbag.encode_odometry(
                t, NpRigid3(pt + rng.normal(0, 0.002, 3), q))))
            mocap_rows.append([t, *pt, *q])
            next_odom += 0.05
        if t >= next_scan:
            pts = raycast_box_room_3d(pt, q, num_azimuth=64, num_elevation=16,
                                      noise_std=0.004, rng=rng)
            n = len(pts)
            # organized sweep: per-point time across the 0.1 s rotation,
            # ring = elevation index — the DRZ sensor convention.
            col = np.arange(n) // 16
            times = (col / max(col.max(), 1) * 0.1 - 0.05).astype(np.float32)
            rings = (np.arange(n) % 16).astype(np.uint16)
            inten = rng.uniform(0, 100, n).astype(np.float32)
            msgs.append(("/os_cloud_node/points", "sensor_msgs/PointCloud2", t,
                         rosbag.encode_point_cloud2(t, np.nan_to_num(pts, nan=0.0),
                                                    width=64, times=times,
                                                    rings=rings, intensities=inten)))
            next_scan += 0.1
        t = round(t + 0.01, 6)
    rosbag.write_bag(path, msgs)
    np.savetxt(mocap_path, np.asarray(mocap_rows), delimiter=",")


@pytest.mark.slow
def test_drz_shaped_bag_runs_mapping_evaluation_3d(tmp_path, capsys):
    from hectorgrapher_tpu.tools.cli import main as cli_main

    bag = str(tmp_path / "rehearsal.bag")
    mocap = str(tmp_path / "rehearsal.mocap.csv")
    synthesize_drz_bag(bag, mocap)

    overrides = [
        "trajectory_builder_3d.submaps.high_grid_size=64",
        "trajectory_builder_3d.submaps.low_grid_size=32",
        "trajectory_builder_3d.optimizing_local_trajectory_builder.initialization_duration=0.45",
        "trajectory_builder_3d.optimizing_local_trajectory_builder.max_control_points=8",
        "trajectory_builder_3d.optimizing_local_trajectory_builder.max_clouds_in_window=8",
        "trajectory_builder_3d.optimizing_local_trajectory_builder.points_per_cloud=128",
        "trajectory_builder_3d.optimizing_local_trajectory_builder.max_num_iterations=6",
        "pose_graph.optimize_every_n_nodes=8",
    ]
    argv = ["mapping-evaluation", "--use_3d", "--sequence_dir", bag]
    for o in overrides:
        argv += ["--config_overrides", o]
    rc = cli_main(argv)
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "ATE RMSE" in out, out  # ground truth was found next to the bag
    rmse = float(out.split("ATE RMSE:")[1].split("m")[0])
    assert rmse < 0.25, out

    # The per-point time field actually reached the decoder.
    events = rosbag.read_bag_sequence(bag)
    range_events = [e for e in events if e.kind == "range"]
    assert range_events and range_events[0].times is not None
    assert float(np.ptp(range_events[0].times)) > 0.05
