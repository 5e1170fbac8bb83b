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
