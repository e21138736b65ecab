from __future__ import annotations

import pytest

from rtsa_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="rtsa_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_sequences(spark):
    """FIXTURES.md F1 'tiny' scale: deterministic, cached for the session."""
    from rtsa_spark.synth import synth_sequences

    df = synth_sequences(spark, 4000, n_sources=6, seed=42, max_tokens=64)
    df.cache().count()
    return df
