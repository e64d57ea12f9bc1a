"""Empty-input totality: EVERY registered query must execute on a
completely empty catalog (0-row tables, correct schemas) and return a
well-typed result — an empty partition/batch/backfill is a normal
pipeline state, not an error. Caught five vector-family crashes
(first().d on an empty corpus; C.shape[1] on an empty centroid/
codebook collect) that an sf-scaled test can never see.
"""

from __future__ import annotations

import pytest

from selfhealingdatapipeline_gcp_spark import catalog, registry

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in catalog.TABLES:
        (catalog.load(spark, SRC, t).limit(0)
         .write.mode("overwrite").parquet(f"{d}/{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", sorted(registry.queries()))
def test_runs_on_empty_catalog(name, spark, empty_dir):
    df = registry.queries()[name](spark, empty_dir)
    assert df.count() >= 0


@pytest.fixture(scope="module")
def one_row_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_one")
    for t in catalog.TABLES:
        (catalog.load(spark, SRC, t).limit(1)
         .write.mode("overwrite").parquet(f"{d}/{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", sorted(registry.queries()))
def test_runs_on_one_row_catalog(name, spark, one_row_dir):
    """Singleton tables exercise zero-variance / zero-history /
    single-member-group paths (caught quality_null_trend's ANSI
    divide-by-zero on an empty baseline)."""
    df = registry.queries()[name](spark, one_row_dir)
    assert df.count() >= 0
