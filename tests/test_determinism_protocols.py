"""Property tests for the r9 integer fixed-point rounding protocols —
the arithmetic identities the tie-free queries rely on (NOTES.md
"Float-determinism protocol")."""

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given
from hypothesis import strategies as st


def q9to8(p: int) -> int:
    """forecast_holt_linear's scale-9 → scale-8 step (analytics.py)."""
    return (p + 5) // 10 if p >= 0 else -((-p + 5) // 10)


@given(st.integers(-(10**18), 10**18))
def test_q9to8_is_decimal_round_half_up(p):
    want = int(
        (Decimal(p) / 10).quantize(Decimal(1), rounding=ROUND_HALF_UP)
    )
    assert q9to8(p) == want


@given(st.integers(0, 10**15), st.integers(1, 10**6))
def test_halfup_div_is_decimal_round_half_up(total, n):
    """orders_seasonality_decompose's (wsum + n//2...) pattern:
    (2*total + n) // (2*n) == round-half-up(total / n) for total >= 0
    (the users_bot_heuristic mean_us formula)."""
    got = (2 * total + n) // (2 * n)
    want = int(
        (Decimal(total) / Decimal(n)).quantize(
            Decimal(1), rounding=ROUND_HALF_UP
        )
    )
    assert got == want


@given(st.integers(0, 10**13))
def test_seasonality_div12_half_up(wsum):
    got = (wsum + 6) // 12
    want = int(
        (Decimal(wsum) / 12).quantize(Decimal(1), rounding=ROUND_HALF_UP)
    )
    assert got == want


@given(st.integers(-(2**52), 2**52))
def test_int_to_double_then_divide_is_engine_identical(v):
    """float(v)/1e8 (the Holt output path) is the two-step rounding both
    engines perform; below 2^53 the int->double step is exact, so the
    result equals the correctly-rounded true quotient."""
    import struct

    a = float(v) / 1e8
    # the fused exact rational, rounded once
    b = v / (10**8)
    assert struct.pack("<d", a) == struct.pack("<d", b)
