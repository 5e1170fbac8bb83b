"""CLI tool tests (ref: pbstream_main usage, ground truth tool mains)."""

import json

import numpy as np
import pytest

from hectorgrapher_tpu.evaluation.metrics import Relation
from hectorgrapher_tpu.evaluation.relations_text_file import (
    read_relations_text_file,
    write_relations_text_file,
)
from hectorgrapher_tpu.tools.cli import main
from hectorgrapher_tpu.transform import np_quat as nq
from hectorgrapher_tpu.transform.np_quat import NpRigid3


def test_relations_text_round_trip(tmp_path):
    relations = [
        Relation(0.0, 1.0, NpRigid3(np.array([1.0, 2.0, 0.5]),
                                    nq.quat_from_axis_angle(np.array([0.1, -0.2, 0.7])))),
        Relation(1.0, 2.0, NpRigid3(np.array([0.0, -1.0, 0.0]), nq.quat_identity())),
    ]
    path = str(tmp_path / "relations.txt")
    write_relations_text_file(path, relations)
    restored = read_relations_text_file(path)
    assert len(restored) == 2
    for a, b in zip(relations, restored):
        np.testing.assert_allclose(a.expected.t, b.expected.t, atol=1e-9)
        assert min(np.linalg.norm(a.expected.q - b.expected.q),
                   np.linalg.norm(a.expected.q + b.expected.q)) < 1e-9


def test_state_info_cli(tmp_path, capsys):
    # Build a tiny state via the serialization test helpers.
    from hectorgrapher_tpu.io.serialization import save_state
    from test_serialization import drive_line, make_options
    from hectorgrapher_tpu.mapping.map_builder import MapBuilder

    mb = MapBuilder(make_options())
    mb.add_trajectory_builder()
    drive_line(mb, n=5)
    path = str(tmp_path / "s.npz")
    save_state(mb.pose_graph, path)

    assert main(["state-info", path]) == 0
    out = capsys.readouterr().out
    assert "nodes:" in out and "submaps:" in out and "trajectories: [0]" in out


def test_print_configuration_cli(capsys):
    assert main(["print-configuration", "--override", "pose_graph.optimize_every_n_nodes=42"]) == 0
    out = capsys.readouterr().out
    parsed = json.loads(out)
    assert parsed["pose_graph"]["optimize_every_n_nodes"] == 42


def test_mocap_ground_truth_cli(tmp_path, capsys):
    csv = tmp_path / "mocap.csv"
    rows = []
    for i in range(50):
        t = i * 0.05
        rows.append(f"{t},{0.1 * t},0,0,1,0,0,0")
    csv.write_text("\n".join(rows))
    out = str(tmp_path / "rel.txt")
    assert main(["ground-truth-from-mocap", str(csv), out, "--pose_time_delta", "0.2"]) == 0
    relations = read_relations_text_file(out)
    assert len(relations) > 5
    np.testing.assert_allclose(relations[0].expected.t, [0.02, 0, 0], atol=1e-9)


def test_compute_relations_metrics_cli(tmp_path, capsys):
    from hectorgrapher_tpu.io.serialization import save_state
    from test_serialization import drive_line, make_options
    from hectorgrapher_tpu.mapping.map_builder import MapBuilder

    mb = MapBuilder(make_options())
    mb.add_trajectory_builder()
    drive_line(mb, n=8)
    state = str(tmp_path / "s.npz")
    save_state(mb.pose_graph, state)

    # ground-truth relations for the same straight line
    relations = []
    for i in range(5):
        t1, t2 = 0.1 * i, 0.1 * (i + 2)
        relations.append(
            Relation(t1, t2, NpRigid3(np.array([0.08 * 2, 0, 0]), nq.quat_identity()))
        )
    rel_path = str(tmp_path / "rel.txt")
    write_relations_text_file(rel_path, relations)

    assert main(["compute-relations-metrics", state, rel_path]) == 0
    out = capsys.readouterr().out
    assert "Abs translational error" in out
    mean = float(out.split()[3])
    assert mean < 0.1


def test_scan_matching_evaluation_cli(capsys):
    """(ref: evaluation/scan_matching_evaluation.cc — perturb/recover
    trials with error statistics.)"""
    from hectorgrapher_tpu.tools.cli import main

    assert main(["scan-matching-evaluation", "--num_trials", "3", "--seed", "1"]) == 0
    out = capsys.readouterr().out
    assert "rmse" in out.lower() or "error" in out.lower()


def test_mapping_evaluation_cli_2d(capsys):
    """(ref: evaluation/mapping_evaluation.cc — end-to-end synthetic SLAM
    with ATE/relation metrics.) Short 2D run to keep CI time bounded."""
    from hectorgrapher_tpu.tools.cli import main

    assert main(["mapping-evaluation", "--duration", "1.2", "--noise", "0"]) == 0
    out = capsys.readouterr().out
    assert "ate_rmse" in out or "ATE" in out
