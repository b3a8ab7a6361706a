"""Regression tripwire for the GC/thread-pool mitigation (BENCH.md "Host
regression"): the round-5 sandbox reboot made the default JDK-17 G1 collector
degenerate into a futex/timer storm (the same CDC replay went 37s -> 225-507s);
the fix is ParallelGC with growth-biased ergonomics plus netty/RPC pools sized
to the CELL's parallelism rather than 2x host cores. A session.py refactor
that drops either silently reintroduces a 6-13x cliff, so this test pins both
behaviors at the config level (cheap — no Spark action runs)."""

from __future__ import annotations

import pytest

from seatunnel_spark.session import default_gc_opts, get_spark


def test_default_gc_opts_shape():
    opts = default_gc_opts("48g")
    assert "-XX:+UseParallelGC" in opts
    assert "-XX:GCTimeRatio=99" in opts
    assert "-XX:MaxHeapFreeRatio=100" in opts  # never shrink the heap back
    assert "-Xms12g" in opts  # quarter of 48g, capped at 12


@pytest.mark.parametrize(
    "heap,expect_xms",
    [
        ("48g", "-Xms12g"),
        ("24g", "-Xms6g"),
        ("4g", "-Xms1g"),
        ("512m", None),  # sub-4g: -Xms omitted (JVM refuses Xms > Xmx)
        ("2048m", None),
        ("3g", None),
        ("1t", "-Xms12g"),  # cap holds above the cap
        ("garbage", None),  # unparseable: never emit a floor
        ("", None),
    ],
)
def test_default_gc_opts_xms_policy(heap, expect_xms):
    opts = default_gc_opts(heap)
    assert "-XX:+UseParallelGC" in opts
    if expect_xms is None:
        assert "-Xms" not in opts
    else:
        assert expect_xms in opts


def test_session_wires_gc_and_cell_sized_pools(spark):
    """The live test session must carry the mitigation: driver JVM opts
    contain default_gc_opts for the configured heap, and the netty/RPC pool
    sizes follow the session's parallelism (conftest: local[8] -> 8), not
    the host's core count."""
    import os

    want = default_gc_opts(os.environ.get("SPARK_DRIVER_MEM", "48g"))
    got = spark.conf.get("spark.driver.extraJavaOptions", "")
    assert want in got, f"driver opts {got!r} lost the GC mitigation {want!r}"
    for k in (
        "spark.rpc.io.serverThreads",
        "spark.rpc.io.clientThreads",
        "spark.shuffle.io.serverThreads",
        "spark.shuffle.io.clientThreads",
        "spark.rpc.netty.dispatcher.numThreads",
    ):
        assert spark.conf.get(k) == "8", f"{k} not cell-sized"


def test_get_spark_env_override(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_JAVA_OPTS", "-Xint")
    assert default_gc_opts("48g") == "-Xint"
