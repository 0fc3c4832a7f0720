import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webgraph_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[8]", app_name="wgs-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def random_graph(n: int, m: int, seed: int, zipf: bool = False):
    """Deterministic random digraph; returns (src, dst) dedup'd, no loops."""
    rng = np.random.default_rng(seed)
    if zipf:
        dst = np.minimum(rng.zipf(1.3, size=m * 2) - 1, n - 1)
    else:
        dst = rng.integers(0, n, size=m * 2)
    src = rng.integers(0, n, size=m * 2)
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)[:m]
    return pairs[:, 0].astype(np.int64), pairs[:, 1].astype(np.int64)


@pytest.fixture(scope="session")
def small_graph(spark):
    """n=300 random digraph as (edges_df, n, src, dst)."""
    n = 300
    src, dst = random_graph(n, 1500, seed=11)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(src, dst)], "src long, dst long"
    ).coalesce(4)
    df = df.persist()
    df.count()
    return df, n, src, dst


@pytest.fixture(scope="session")
def skew_graph(spark):
    """n=400 Zipf-skewed digraph (hub vertices) for salting paths."""
    n = 400
    src, dst = random_graph(n, 3000, seed=23, zipf=True)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(src, dst)], "src long, dst long"
    ).coalesce(4)
    df = df.persist()
    df.count()
    return df, n, src, dst
