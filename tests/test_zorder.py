"""Z-order layout: multi-dimensional file pruning beats single-key sort."""

from __future__ import annotations

import tempfile


def test_zorder_prunes_on_both_dimensions(spark):
    from ranger_spark.sources.zorder import files_overlapping, write_zordered

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    lo_o, hi_o = li.selectExpr("min(l_orderkey)", "max(l_orderkey)").first()
    lo_p, hi_p = li.selectExpr("min(l_partkey)", "max(l_partkey)").first()

    base = tempfile.mkdtemp(prefix="zorder_")
    plain, zpath = f"{base}/plain", f"{base}/zorder"
    # single-key layout: sorted by orderkey only
    (
        li.repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(plain)
    )
    write_zordered(li, zpath, ["l_orderkey", "l_partkey"], num_files=8)

    # a 10%-range predicate on EACH dimension, off-center: a window
    # straddling the key-space midpoint touches both top-bit halves of
    # any space-filling curve and defeats pruning by construction
    def window(lo, hi):
        span = hi - lo
        return lo + span * 20 // 100, lo + span * 30 // 100

    o_lo, o_hi = window(lo_o, hi_o)
    p_lo, p_hi = window(lo_p, hi_p)

    plain_o, total = files_overlapping(plain, "l_orderkey", o_lo, o_hi)
    plain_p, _ = files_overlapping(plain, "l_partkey", p_lo, p_hi)
    z_o, ztotal = files_overlapping(zpath, "l_orderkey", o_lo, o_hi)
    z_p, _ = files_overlapping(zpath, "l_partkey", p_lo, p_hi)

    assert total == 8 and ztotal == 8
    # single-key layout prunes its own key hard but not the other one
    assert plain_o <= 3
    assert plain_p == 8
    # z-order prunes BOTH dimensions meaningfully
    assert z_o <= 6
    assert z_p <= 6

    # data intact
    back = spark.read.parquet(zpath)
    assert back.count() == li.count()
    assert (
        back.selectExpr("sum(l_quantity) AS s").first().s
        == li.selectExpr("sum(l_quantity) AS s").first().s
    )


def test_optimize_zorder_statement(engine, spark):
    import glob

    from ranger_spark.sources.zorder import files_overlapping

    engine.execute("CREATE DATABASE IF NOT EXISTS zo;")
    engine.execute("CREATE TABLE zo.t (a int32, b int32);")
    # 4 small inserts -> fragmented files; values cover a 2-D grid
    rows = [(i, (i * 37) % 1024) for i in range(1024)]
    for chunk in range(4):
        vals = ", ".join(
            f"({a}, {b})" for a, b in rows[chunk * 256 : (chunk + 1) * 256]
        )
        engine.execute(f"INSERT INTO zo.t (a, b) VALUES {vals};")
    r = engine.execute("OPTIMIZE zo.t TARGET 128 ZORDER BY (a, b);")
    assert "optimized" in r.message
    vt = engine._versioned_for("zo.t")
    files = vt.files()
    assert len(files) == 8  # 1024 rows / 128 target
    # both dimensions prune on the z-ordered layout (off-center window)
    import os

    d = os.path.dirname(files[0])
    oa, ta = files_overlapping(d, "a", 200, 300)
    ob, tb = files_overlapping(d, "b", 200, 300)
    assert ta == 8 and oa <= 6
    assert ob <= 6
    # rows intact
    assert engine.execute("SELECT count(*) AS c FROM zo.t;").rows[0][0] == 1024
    # bad column -> typed error
    import pytest as _pytest

    from ranger_spark.errors import RangerError

    with _pytest.raises(RangerError):
        engine.execute("OPTIMIZE zo.t ZORDER BY (nope);")


def test_optimize_zorder_type_validation(engine):
    import pytest as _pytest

    from ranger_spark.errors import RangerError

    engine.execute("CREATE DATABASE IF NOT EXISTS zot;")
    engine.execute(
        "CREATE TABLE zot.t (a int32, s string, d date);"
    )
    engine.execute(
        "INSERT INTO zot.t (a, s, d) VALUES "
        "(1, 'x', '2024-01-01'), (2, 'y', '2024-06-01'), "
        "(3, 'z', '2024-12-31');"
    )
    # string column -> typed VALIDATION_FAILED, not a silent no-op layout
    with _pytest.raises(RangerError) as ei:
        engine.execute("OPTIMIZE zot.t ZORDER BY (s);")
    assert "non-orderable type" in str(ei.value)
    # date column is epoch-coerced and clusters fine
    r = engine.execute("OPTIMIZE zot.t TARGET 2 ZORDER BY (d, a);")
    assert "optimized" in r.message
    assert (
        engine.execute("SELECT count(*) AS c FROM zot.t;").rows[0][0] == 3
    )
    engine.execute("DROP DATABASE zot CASCADE;")
