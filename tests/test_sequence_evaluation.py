"""File-driven end-to-end evaluation: record a synthetic sequence to disk
(PLY scans + odometry/mocap CSVs), then run the full SLAM + metrics
pipeline through the CLI exactly as a DRZ-formatted dataset would run
(ref: evaluation/mapping_evaluation.cc:38-268 consumes recorded
point-cloud files; generate_ground_truth_from_mocap_main.cc consumes the
mocap CSV)."""

import numpy as np
import pytest

from hectorgrapher_tpu.evaluation.scan_generator import raycast_rect_room_2d
from hectorgrapher_tpu.io.readers import write_ply
from hectorgrapher_tpu.tools.cli import main as cli_main


@pytest.fixture(scope="module")
def sequence_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("seq")
    rng = np.random.default_rng(7)
    odom_rows, mocap_rows = [], []
    for i in range(8):
        t = 0.1 * i
        x = 0.08 * i
        pts = raycast_rect_room_2d(np.array([x, 0.0]), 0.0, num_rays=720)
        pts = pts[~np.isnan(pts[:, 0])].astype(np.float32)
        write_ply(str(path / f"scan_{t:0.3f}.ply"), pts)
        noisy = np.array([x, 0, 0]) + rng.normal(0, 0.002, 3)
        odom_rows.append([t - 0.001, noisy[0], noisy[1], noisy[2], 1, 0, 0, 0])
        mocap_rows.append([t, x, 0, 0, 1, 0, 0, 0])
    np.savetxt(path / "odometry.csv", odom_rows, delimiter=",")
    np.savetxt(path / "mocap.csv", mocap_rows, delimiter=",")
    return str(path)


def test_sequence_dir_evaluation_produces_ate(sequence_dir, tmp_path, capsys):
    state_path = str(tmp_path / "seq_state.npz")
    rc = cli_main(
        [
            "mapping-evaluation",
            "--sequence_dir", sequence_dir,
            "--output_state", state_path,
            "--config_overrides", 'trajectory_builder_2d.submaps.num_range_data=4',
            "--config_overrides", 'trajectory_builder_2d.motion_filter.max_distance_meters=0.05',
            "--config_overrides", 'trajectory_builder_2d.motion_filter.max_time_seconds=0.1',
            "--config_overrides", 'pose_graph.optimize_every_n_nodes=0',
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "ATE RMSE" in out
    rmse = float(out.split("ATE RMSE:")[1].split("m")[0])
    assert rmse < 0.1, out  # recorded drive is 0.56 m long, noise 2 mm

    # The written state feeds the relations tooling end-to-end, in the
    # reference's binary GroundTruth proto format.
    relations_pb = str(tmp_path / "relations.pb")
    rc = cli_main(
        ["ground-truth-from-mocap", f"{sequence_dir}/mocap.csv", relations_pb,
         "--pose_time_delta", "0.2", "--format", "proto"]
    )
    assert rc == 0
    rc = cli_main(["compute-relations-metrics", state_path, relations_pb])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Abs translational error" in out
    abs_err = float(out.split("Abs translational error")[1].split("+/-")[0])
    assert abs_err < 0.05


@pytest.fixture(scope="module")
def sequence_dir_3d(tmp_path_factory):
    """Recorded 3D sequence: PLY scans + imu.csv/odometry.csv/mocap.csv —
    the DRZ-shaped input for the CT pipeline (--use_3d)."""
    from hectorgrapher_tpu.evaluation.scan_generator import raycast_box_room_3d
    from hectorgrapher_tpu.transform import np_quat as nq

    path = tmp_path_factory.mktemp("seq3d")
    rng = np.random.default_rng(11)
    gravity = np.array([0.0, 0.0, 9.80665])

    def gt(t, speed=0.25, rest=0.6):
        return np.array([speed * max(0.0, t - rest), 0.0, 0.0])

    imu_rows, odom_rows, mocap_rows = [], [], []
    t, dt_imu, next_odom, next_scan = 0.0, 0.01, 0.0, 0.05
    while t <= 2.4:
        accel = gravity  # level drive: gravity only, zero gyro
        imu_rows.append([t, accel[0], accel[1], accel[2], 0, 0, 0])
        if t >= next_odom:
            p = gt(t) + rng.normal(0, 0.002, 3)
            odom_rows.append([t, p[0], p[1], p[2], 1, 0, 0, 0])
            next_odom += 0.05
        if t >= next_scan:
            pts = raycast_box_room_3d(
                gt(t), nq.quat_identity(), num_azimuth=96, num_elevation=24,
                noise_std=0.004, rng=rng,
            )
            pts = pts[~np.isnan(pts[:, 0])].astype(np.float32)
            write_ply(str(path / f"scan_{t:0.3f}.ply"), pts)
            mocap_rows.append([t] + list(gt(t)) + [1, 0, 0, 0])
            next_scan += 0.1
        t = round(t + dt_imu, 6)
    np.savetxt(path / "imu.csv", imu_rows, delimiter=",")
    np.savetxt(path / "odometry.csv", odom_rows, delimiter=",")
    np.savetxt(path / "mocap.csv", mocap_rows, delimiter=",")
    return str(path)


def test_sequence_dir_evaluation_3d_ct(sequence_dir_3d, capsys):
    """File-driven 3D continuous-time SLAM end-to-end: the recorded
    sequence drives the CT pipeline through the same CLI a DRZ run uses."""
    rc = cli_main(
        [
            "mapping-evaluation",
            "--sequence_dir", sequence_dir_3d,
            "--use_3d",
            "--config_overrides", 'trajectory_builder_3d.submaps.high_grid_size=96',
            "--config_overrides", 'trajectory_builder_3d.submaps.low_grid_size=48',
            "--config_overrides", 'trajectory_builder_3d.submaps.num_range_data=8',
            "--config_overrides", 'trajectory_builder_3d.submaps.grid_type="TSDF"',
            "--config_overrides", 'trajectory_builder_3d.motion_filter.max_distance_meters=0.02',
            "--config_overrides", 'trajectory_builder_3d.motion_filter.max_time_seconds=0.05',
            "--config_overrides", 'trajectory_builder_3d.optimizing_local_trajectory_builder.initialization_duration=0.45',
            "--config_overrides", 'trajectory_builder_3d.optimizing_local_trajectory_builder.points_per_cloud=256',
            "--config_overrides", 'pose_graph.optimize_every_n_nodes=0',
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "ATE RMSE" in out, out
    rmse = float(out.split("ATE RMSE:")[1].split("m")[0])
    assert rmse < 0.15, out
