"""Fast oracle-parity gate inside pytest: a representative subset of
queries compared against DuckDB at sf0.001 (the full gate is
tools/check_correctness.py at sf0.01)."""

from __future__ import annotations

import duckdb
import pytest

from ranger_spark.queries import load_all
from ranger_spark.tables import TABLES
from tests.conftest import SF_DIR

SUBSET = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "filter_between",
    "scalar_functions",
    "case_when_buckets",
    "window_topn_per_group",
    "events_sessionization",
    "dedup_exact",
    "text_quality",
    "embedding_stats",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    rows = []
    for r in df.itertuples(index=False, name=None):
        rows.append(
            tuple(
                f"{v:.9g}" if isinstance(v, float) else str(v) for v in r
            )
        )
    return sorted(rows)


@pytest.mark.parametrize("name", SUBSET)
def test_matches_oracle(spark, duck, name):
    spec = load_all()[name]
    sdf = spec.builder(spark, SF_DIR).toPandas()
    ddf = duck.execute(spec.oracle).fetchdf()
    assert len(sdf) == len(ddf)
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert _normalize(sdf) == _normalize(ddf)
