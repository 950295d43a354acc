"""Registry-wide smoke: every query builds and returns rows at sf0.001
(the driver's smoke scale) — catches empty-result and schema regressions
before the driver does."""

from __future__ import annotations

import pytest

from ranger_spark.queries import load_all
from tests.conftest import SF_DIR


@pytest.mark.parametrize("name", sorted(load_all()))
def test_query_nonempty_at_smoke_scale(spark, name):
    spec = load_all()[name]
    df = spec.builder(spark, SF_DIR)
    assert df.columns, name
    assert df.count() > 0, f"{name} returned 0 rows at sf0.001"


def test_front_rotation_names_exist():
    """Every name in the certification front tuple must exist in the
    registry — a typo would silently shrink the driver-certified window
    (the `n in reg` filter drops unknown names without error)."""
    import __spark_entry__ as entry
    from ranger_spark.queries import load_all

    reg = load_all()
    front = next(
        getattr(entry, a) for a in sorted(dir(entry), reverse=True)
        if a.startswith("_FRONT_R")
    )
    missing = [n for n in front if n not in reg]
    assert not missing, f"front names not in registry: {missing}"
    assert len(set(front)) == len(front), "duplicate names in the front"
