from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from katta_spark.session import get_spark  # noqa: E402
from katta_spark.synth import synth_transcripts  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("katta_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_transcripts(spark):
    """~2,000 turns / 100 convs, seeded — the unit/rank-identity corpus."""
    df = synth_transcripts(spark, n_turns=2000, seed=42).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
