"""Snapshot layer: time travel + incremental (CDC-style) reads."""

from __future__ import annotations

import tempfile

import pytest


@pytest.fixture()
def table(spark):
    from ranger_spark.sources.snapshots import SnapshotTable

    return SnapshotTable(tempfile.mkdtemp(prefix="snap_tbl_"))


def test_time_travel(spark, table):
    v1 = table.append(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]))
    v2 = table.append(spark.createDataFrame([(3, "c")], ["id", "v"]))
    assert (v1, v2) == (1, 2)
    assert table.read(spark, 1).count() == 2
    assert table.read(spark, 2).count() == 3
    assert table.read(spark).count() == 3  # latest
    assert sorted(r.id for r in table.read(spark, 1).collect()) == [1, 2]


def test_incremental_cdc_read(spark, table):
    table.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    table.append(spark.createDataFrame([(2, "b"), (3, "c")], ["id", "v"]))
    table.append(spark.createDataFrame([(4, "d")], ["id", "v"]))
    # subscriber last saw v1 → replays exactly v2+v3 additions
    delta = table.incremental(spark, from_version=1)
    assert sorted(r.id for r in delta.collect()) == [2, 3, 4]
    mid = table.incremental(spark, from_version=1, to_version=2)
    assert sorted(r.id for r in mid.collect()) == [2, 3]
    none = table.incremental(spark, from_version=3)
    assert none.count() == 0


def test_history(spark, table):
    table.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    table.append(spark.createDataFrame([(2, "b")], ["id", "v"]))
    h = table.history()
    assert [e["version"] for e in h] == [1, 2]
    assert h[1]["parent"] == 1
    assert h[1]["num_files"] >= h[1]["num_added"]


def test_read_empty_raises(spark, table):
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        table.read(spark)


def test_concurrent_appends_no_lost_update(spark, table):
    # ADVICE r1: two racing appends must not silently clobber each other's
    # manifest — commits serialize under the flock and publish via
    # os.link (EEXIST on collision), so both land as distinct versions
    import threading

    df1 = spark.createDataFrame([(1, "a")], ["id", "v"])
    df2 = spark.createDataFrame([(2, "b")], ["id", "v"])
    errs: list[Exception] = []

    def run(df):
        try:
            table.append(df)
        except Exception as e:  # pragma: no cover - failure path
            errs.append(e)

    ts = [threading.Thread(target=run, args=(d,)) for d in (df1, df2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert table.current_version() == 2
    # both commits' rows are visible at the head snapshot
    assert sorted(r.id for r in table.read(spark).collect()) == [1, 2]
    # and every version's file list is a strict superset of its parent's
    h = table.history()
    assert [m["num_files"] for m in h] == sorted(m["num_files"] for m in h)


def _vt_append_proc(root, fname, barrier):
    # child process: stage a data file, then fast-append it; the barrier
    # makes both children enter commit() together so a stale-base-list
    # bug (VERDICT r2: engine._append_commit computed the base file list
    # outside the lock) would reliably drop one side's file
    import os

    from ranger_spark.sources.snapshots import VersionedTable

    vt = VersionedTable(root)
    data_dir = vt.snapshot_dir()
    path = os.path.join(data_dir, fname)
    open(path, "w").close()
    barrier.wait(timeout=30)
    vt.commit(files=None, data_dir=data_dir, operation="append", added=[path])


def test_versioned_concurrent_fast_append_two_processes(tmp_path):
    # VERDICT r2 fix: files=None → commit merges the previous manifest's
    # list + `added` INSIDE the flock, so two processes appending from
    # the same base version both land and neither's files vanish
    import multiprocessing as mp
    import os

    from ranger_spark.sources.snapshots import VersionedTable

    root = str(tmp_path / "vt")
    data_dir = os.path.join(root, "s1-base")
    os.makedirs(data_dir)
    base = os.path.join(data_dir, "part-base.parquet")
    open(base, "w").close()
    vt = VersionedTable(root)
    vt.commit(files=[base], data_dir=data_dir, operation="create")

    ctx = mp.get_context("fork")
    barrier = ctx.Barrier(2)
    procs = [
        ctx.Process(
            target=_vt_append_proc,
            args=(root, f"part-child{i}.parquet", barrier),
        )
        for i in (1, 2)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=60)
    assert all(p.exitcode == 0 for p in procs)
    assert vt.current_version() == 3
    head = set(os.path.basename(f) for f in vt.files())
    # both children's files AND the base survive in the head manifest
    assert head == {
        "part-base.parquet",
        "part-child1.parquet",
        "part-child2.parquet",
    }
