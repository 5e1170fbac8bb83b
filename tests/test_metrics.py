"""Metrics + profiling utilities (ref: metrics/* + instrumented sections)."""

def test_profiling_sections_and_report():
    from hectorgrapher_tpu.common import profiling

    with profiling.section("unit_test_section"):
        pass
    with profiling.section("unit_test_section"):
        pass
    text = profiling.report()
    assert "hg_section_seconds" in text
    assert "unit_test_section" in text

    with profiling.annotate("unit_test_annotation"):
        pass


def test_device_trace_context(tmp_path):
    import jax.numpy as jnp

    from hectorgrapher_tpu.common import profiling

    with profiling.device_trace(str(tmp_path / "trace")) as log_dir:
        x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
        x.block_until_ready()
    assert log_dir


def test_default_exporter_serves_process_registry():
    """The default MetricsExporter must expose the SAME registry the
    instrumentation writes to (a second registry left /metrics empty —
    caught by the round-2 server smoke)."""
    import urllib.request

    from hectorgrapher_tpu.common import profiling
    from hectorgrapher_tpu.metrics.http_exporter import MetricsExporter

    with profiling.section("exporter_smoke"):
        pass
    exporter = MetricsExporter(port=0).start()
    try:
        body = urllib.request.urlopen(
            f"http://127.0.0.1:{exporter.port}/metrics", timeout=10
        ).read().decode()
    finally:
        exporter.shutdown()
    assert "hg_section_seconds" in body


def test_frontend_latency_and_rtr_metrics():
    """Local-SLAM latency + real-time-ratio metrics publish per scan
    (VERDICT r2 #6; ref: local_trajectory_builder_2d.cc:29-36)."""
    import numpy as np

    from hectorgrapher_tpu.common.config import MapBuilderOptions, replace_deep
    from hectorgrapher_tpu.evaluation.scan_generator import raycast_rect_room_2d
    from hectorgrapher_tpu.mapping import frontend_metrics
    from hectorgrapher_tpu.mapping.local_2d import LocalTrajectoryBuilder2D
    from hectorgrapher_tpu.sensor.types import TimedPointCloudData, pad_timed_cloud

    import jax.numpy as jnp

    options = replace_deep(
        MapBuilderOptions(), {"trajectory_builder_2d.use_imu_data": False}
    ).trajectory_builder_2d
    builder = LocalTrajectoryBuilder2D(options)
    fams = frontend_metrics._families()
    latency = fams["latency"].add({"builder": "2d"})
    rtr = fams["rtr"].add({"builder": "2d"})
    count_before = sum(latency.counts_by_bucket)
    for k in range(4):
        t = 0.1 * k
        pts = raycast_rect_room_2d(np.array([0.05 * k, 0.0]), 0.0, num_rays=240)
        pts = pts[~np.isnan(pts[:, 0])]
        cloud = pad_timed_cloud(pts, np.zeros(len(pts), np.float32), 512)
        builder.add_range_data(
            TimedPointCloudData(
                time=jnp.asarray(t), origin=jnp.zeros(3, jnp.float32),
                ranges=cloud, width=240,
            )
        )
    assert sum(latency.counts_by_bucket) >= count_before + 4
    assert rtr.value > 0.0  # sensor-seconds per wall-second was published


def test_pose_graph_residual_histograms_follow_the_knob():
    """log_residual_histograms populates residual histograms after an
    optimization round (ref: pose_graph.lua:88) — no longer a dead knob."""
    import numpy as np

    from hectorgrapher_tpu.common.config import MapBuilderOptions, replace_deep
    from hectorgrapher_tpu.mapping.grids import make_probability_grid
    import hectorgrapher_tpu.mapping.pose_graph.pose_graph as pg_mod
    from hectorgrapher_tpu.mapping.pose_graph.pose_graph import PgNode, PoseGraph2D
    from hectorgrapher_tpu.mapping.submap_2d import Submap2D
    from hectorgrapher_tpu.transform.np_quat import NpRigid3

    options = replace_deep(
        MapBuilderOptions(),
        {
            "pose_graph.async_work_queue": False,
            "pose_graph.optimize_every_n_nodes": 0,
            "pose_graph.constraint_builder.sampling_ratio": 0.0,
        },
    ).pose_graph
    pg = PoseGraph2D(options)
    submap = Submap2D(
        local_pose=NpRigid3(np.zeros(3)),
        grid=make_probability_grid(0.05, (16, 16)),
        insertion_finished=False,
    )
    for k in range(3):
        pg.add_node(
            PgNode(
                time=0.1 * k,
                local_pose=NpRigid3(np.array([0.1 * k, 0.0, 0.0])),
                global_pose=NpRigid3.identity(),
            ),
            [submap],
        )
    pg.run_final_optimization(5)
    fam = pg_mod._RESIDUAL_HISTOGRAMS["trans"]
    counts = sum(sum(m.counts_by_bucket) for _, m in fam.items())
    assert counts >= 3  # one observation per constraint
