"""Pre-joined fact projection (deployment layout v3, VERDICT r13 #3):
the opt-in path must return byte-identical q3 results to the base-table
plan, build idempotently, and never leak the conf."""

from __future__ import annotations

import os

from ranger_spark.queries import load_all
from ranger_spark.sources.prejoined import (
    PROJECTION_COLS,
    ensure_prejoined_fact,
    prejoined_path,
)
from tests.conftest import SF_DIR


def test_prejoined_q3_matches_base_plan(spark, tmp_path):
    layout = str(tmp_path / "pj")
    path = ensure_prejoined_fact(spark, SF_DIR, layout_path=layout)
    assert path == layout
    # idempotent: second call returns without rebuilding (mtime stable)
    marker = os.path.join(path, "_SUCCESS")
    m0 = os.path.getmtime(marker)
    assert ensure_prejoined_fact(spark, SF_DIR, layout_path=layout) == layout
    assert os.path.getmtime(marker) == m0

    pj = spark.read.parquet(path)
    assert tuple(pj.columns) == PROJECTION_COLS
    # row count = inner-join cardinality = lineitem rows (every lineitem
    # has its order)
    li_rows = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    assert pj.count() == li_rows

    q3 = load_all()["q3_shipping_priority"].builder
    base = q3(spark, SF_DIR).collect()
    spark.conf.set("spark.ranger.prejoined.dir", path)
    try:
        via_pj = q3(spark, SF_DIR).collect()
    finally:
        spark.conf.set("spark.ranger.prejoined.dir", "")
    assert via_pj == base
    # conf restored: base plan again
    assert q3(spark, SF_DIR).collect() == base


def test_prejoined_default_path_is_src_local():
    assert prejoined_path("/x/y") == "/x/y/.prejoined_orders_lineitem"
