"""Unit tests for the JAVA_TOOL_OPTIONS GC-thread sizing (no Spark needed).

The hazard: a fragment written for a local[1] JVM leaking unchanged into a
later/child get_spark(cores=8) would cap an 8-core JVM at 2 GC threads —
the inverse of the ~20% win the sizing exists for. _size_gc_threads tags
its own fragment with -Drtsa.gc.auto so it can re-size what IT wrote while
never touching a caller-provided ParallelGCThreads.
"""
from __future__ import annotations

import os

import pytest

from rtsa_spark.session import _size_gc_threads


@pytest.fixture
def jto_env():
    saved = os.environ.get("JAVA_TOOL_OPTIONS")
    yield
    if saved is None:
        os.environ.pop("JAVA_TOOL_OPTIONS", None)
    else:
        os.environ["JAVA_TOOL_OPTIONS"] = saved


def test_fresh_env_writes_tagged_fragment(jto_env):
    os.environ.pop("JAVA_TOOL_OPTIONS", None)
    _size_gc_threads(8)
    v = os.environ["JAVA_TOOL_OPTIONS"]
    assert "-Drtsa.gc.auto=8" in v
    assert "-XX:ParallelGCThreads=8" in v
    assert "-XX:ConcGCThreads=4" in v


def test_own_stale_fragment_is_resized(jto_env):
    os.environ.pop("JAVA_TOOL_OPTIONS", None)
    _size_gc_threads(1)
    assert "-XX:ParallelGCThreads=2" in os.environ["JAVA_TOOL_OPTIONS"]
    # same process OR a child that inherited the env: re-size, don't skip
    _size_gc_threads(8)
    v = os.environ["JAVA_TOOL_OPTIONS"]
    assert "-XX:ParallelGCThreads=8" in v
    assert "ParallelGCThreads=2" not in v
    assert v.count("rtsa.gc.auto") == 1


def test_caller_provided_setting_is_never_touched(jto_env):
    os.environ["JAVA_TOOL_OPTIONS"] = "-XX:ParallelGCThreads=5 -Xmx2g"
    _size_gc_threads(8)
    assert os.environ["JAVA_TOOL_OPTIONS"] == "-XX:ParallelGCThreads=5 -Xmx2g"


def test_caller_options_around_ours_survive_resize(jto_env):
    os.environ["JAVA_TOOL_OPTIONS"] = "-Xmx2g"
    _size_gc_threads(4)
    os.environ["JAVA_TOOL_OPTIONS"] += " -XX:MaxMetaspaceSize=512m"
    _size_gc_threads(8)
    v = os.environ["JAVA_TOOL_OPTIONS"]
    assert "-Xmx2g" in v
    assert "-XX:MaxMetaspaceSize=512m" in v
    assert "-XX:ParallelGCThreads=8" in v
    assert "ParallelGCThreads=4" not in v
