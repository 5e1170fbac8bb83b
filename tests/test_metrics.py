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
