"""Points pipeline tests (ref: io/*_points_processor tests +
fake_file_writer usage)."""

import os

import numpy as np

from hectorgrapher_tpu.evaluation.scan_generator import raycast_rect_room_2d
from hectorgrapher_tpu.io.image import write_png
from hectorgrapher_tpu.io.points_pipeline import (
    CountingPointsProcessor,
    NullPointsProcessor,
    PointsBatch,
    build_pipeline,
)


def make_batch(n=100, seed=0, frame="lidar"):
    rng = np.random.default_rng(seed)
    return PointsBatch(
        points=rng.uniform(-5, 5, (n, 3)),
        origin=np.zeros(3),
        frame_id=frame,
    )


def test_pipeline_filters_and_counts(tmp_path):
    counter_probe = {}

    pipeline = build_pipeline(
        [
            {"action": "min_max_range_filter", "min_range": 1.0, "max_range": 6.0},
            {"action": "count"},
            {"action": "write_xyz", "filename": str(tmp_path / "out.xyz")},
        ]
    )
    batch = make_batch(200)
    pipeline.process(batch)
    pipeline.flush()

    counting = pipeline.next  # min_max -> count -> xyz
    assert isinstance(counting, CountingPointsProcessor)
    r = np.linalg.norm(batch.points, axis=-1)
    expected = int(((r >= 1.0) & (r <= 6.0)).sum())
    assert counting.num_points == expected
    lines = open(tmp_path / "out.xyz").read().strip().splitlines()
    assert len(lines) == expected


def test_ply_and_pcd_output(tmp_path):
    ply = str(tmp_path / "cloud.ply")
    pcd = str(tmp_path / "cloud.pcd")
    pipeline = build_pipeline(
        [{"action": "write_ply", "filename": ply}, {"action": "write_pcd", "filename": pcd}]
    )
    pipeline.process(make_batch(50))
    pipeline.flush()
    header = open(ply, "rb").read(200).decode(errors="ignore")
    assert "element vertex 50" in header
    pcd_text = open(pcd).read()
    assert "POINTS 50" in pcd_text


def test_xray_and_probability_grid_png(tmp_path):
    xray = str(tmp_path / "xray.png")
    pgrid = str(tmp_path / "grid.png")
    pipeline = build_pipeline(
        [
            {"action": "write_xray_image", "filename": xray, "voxel_size": 0.1},
            {"action": "write_probability_grid", "filename": pgrid, "resolution": 0.1, "size": 256},
        ]
    )
    pts = raycast_rect_room_2d(np.zeros(2), 0.0, num_rays=720)
    pts = pts[~np.isnan(pts[:, 0])]
    pipeline.process(PointsBatch(points=pts.astype(np.float64), origin=np.zeros(3)))
    pipeline.flush()
    assert open(xray, "rb").read(8) == b"\x89PNG\r\n\x1a\n"
    assert open(pgrid, "rb").read(8) == b"\x89PNG\r\n\x1a\n"
    assert os.path.getsize(xray) > 100
    assert os.path.getsize(pgrid) > 100


def test_frame_filter_and_sampler(tmp_path):
    out = str(tmp_path / "f.xyz")
    pipeline = build_pipeline(
        [
            {"action": "frame_id_filter", "keep_frames": ["lidar"]},
            {"action": "fixed_ratio_sampler", "sampling_ratio": 0.5},
            {"action": "write_xyz", "filename": out},
        ]
    )
    pipeline.process(make_batch(100, frame="lidar"))
    pipeline.process(make_batch(100, frame="other"))
    pipeline.flush()
    lines = open(out).read().strip().splitlines()
    assert len(lines) == 50  # other frame dropped, half sampled


def test_png_writer_roundtrip_header(tmp_path):
    img = (np.arange(64 * 32).reshape(64, 32) % 256).astype(np.uint8)
    path = str(tmp_path / "t.png")
    write_png(path, img)
    data = open(path, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data and b"IDAT" in data and b"IEND" in data


def test_coloring_and_intensity_to_color():
    from hectorgrapher_tpu.io.points_pipeline import build_pipeline

    sink = build_pipeline([{"action": "color_points", "color": [1.0, 0.0, 0.0], "frame_id": "lidar"}])
    batch = make_batch(10)
    sink.process(batch)
    assert batch.colors is not None and batch.colors.shape == (10, 3)
    np.testing.assert_allclose(batch.colors[0], [1, 0, 0])

    sink = build_pipeline([{"action": "intensity_to_color", "min_intensity": 10.0, "max_intensity": 20.0}])
    batch = make_batch(5)
    batch.intensities = np.array([5.0, 10.0, 15.0, 20.0, 30.0])
    sink.process(batch)
    np.testing.assert_allclose(batch.colors[:, 0], [0.0, 0.0, 0.5, 1.0, 1.0])
    np.testing.assert_allclose(batch.colors[:, 0], batch.colors[:, 1])


def test_outlier_removing_multipass():
    """A voxel seen by many passing rays but few hits is removed
    (ref: outlier_removing_points_processor.cc three-phase voting)."""
    from hectorgrapher_tpu.io.points_pipeline import (
        CountingPointsProcessor,
        NullPointsProcessor,
        OutlierRemovingPointsProcessor,
        run_pipeline,
    )

    counter = CountingPointsProcessor(NullPointsProcessor())
    remover = OutlierRemovingPointsProcessor(counter, voxel_size=0.5, miss_per_hit_limit=3.0)

    # A "moving object" point at x=2 is hit once, but 20 later beams to a
    # wall at x=10 pass straight through its voxel. A "wall" point at x=10
    # is hit 20 times with nothing beyond it.
    def source():
        batches = [PointsBatch(points=np.array([[2.0, 0.0, 0.0]]), origin=np.zeros(3))]
        for _ in range(20):
            batches.append(PointsBatch(points=np.array([[10.0, 0.0, 0.0]]), origin=np.zeros(3)))
        return batches

    run_pipeline(remover, source)
    # wall points survive (20 batches x 1 point); the moving point is dropped
    assert counter.num_points == 20


def test_hybrid_grid_writer(tmp_path):
    from hectorgrapher_tpu.io.points_pipeline import build_pipeline

    out = str(tmp_path / "grid.npz")
    pipeline = build_pipeline([
        {"action": "write_hybrid_grid", "filename": out, "voxel_size": 0.1, "size": 64},
    ])
    pts = np.array([[1.0, 0.5, 0.25], [-0.8, 0.3, -0.4]], np.float32)
    pipeline.process(PointsBatch(points=pts, origin=np.zeros(3)))
    pipeline.flush()
    data = np.load(out)
    assert data["log_odds"].shape == (64, 64, 64)
    assert data["known"].sum() >= 2  # hit cells plus free-space misses
    assert float(data["resolution"]) == np.float32(0.1)
