"""Mechanical enforcement of the float-determinism rounding protocol.

The r8→r9 hash failures shared one shape: a ROUND applied to an
ORDER-DEPENDENT double sum at a scale coarser than the summand's true
decimal grid — the true value can sit exactly on the rounding half-grid
and the two engines' summation orders resolve the tie differently
(NOTES.md "Float-determinism protocol"). This lint finds that shape
statically in the Spark-side query builders:

  FLAG  F.round(F.sum(<expr with a product>), k)      # 4dp money, etc.
  FLAG  F.round(F.sum(F.round(<x>, j)), k)  with j>k  # pre-snapped grid
  OK    F.round(F.sum(<single column>), k)            # grid == scale: the
                                                      # round IS the snap
  OK    F.round(F.round(F.sum(...), g).cast("decimal(38,g)"), k)
                                                      # money_round2 form
  OK    money_round2(F.sum(...), g)

Exit 1 and list offenders when a flagged site exists. Run by
tests/test_round_lint.py so a new query can't reintroduce the pattern.

Heuristic, not a proof: it inspects builder source text (the oracle SQL
pairs with the builder by protocol), and a product inside sum() is taken
as "finer grid than the rounding scale" unless the sum is wrapped in the
decimal grid-snap form.
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCAN = [
    os.path.join(ROOT, "ranger_spark", "queries"),
    os.path.join(ROOT, "ranger_spark", "operators"),
]


def _strip(src: str) -> str:
    # drop comments and collapse whitespace so patterns span lines
    src = re.sub(r"#[^\n]*", "", src)
    return re.sub(r"\s+", " ", src)


def _matched(src: str, start: int) -> str:
    """Return the balanced-paren argument span starting at src[start]=='('."""
    depth = 0
    for i in range(start, len(src)):
        if src[i] == "(":
            depth += 1
        elif src[i] == ")":
            depth -= 1
            if depth == 0:
                return src[start + 1 : i]
    return src[start + 1 :]


def _outer_scale(after_sum: str) -> int | None:
    """The k in `F.round(F.sum(...) <maybe .over(w)>, k)` — after_sum is
    the text following the balanced F.sum(...) span inside the round."""
    m = re.match(r"\s*(?:\.over\([^)]*\))?\s*,\s*(\d+)\s*,?\s*\)", after_sum)
    return int(m.group(1)) if m else None


# Columns (and derived-expression name fragments) whose values are
# money-scale in this schema: any sum/avg over them is O(1e4)+ at sf0.1
# and grows with SF, so sub-cent rounding is magnitude-blind.
_REVENUE_COLS = (
    r"(extendedprice|totalprice|supplycost|retailprice|acctbal|"
    r"revenue|price)"
)


def _top_level_split(args: str) -> list[str]:
    """Split a balanced argument span at top-level commas."""
    parts, depth, cur = [], 0, []
    for ch in args:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def _revenue_scale_flags(flat, round_pat, agg_pat, cast_pat, label):
    """Shared engine for the r13 revenue-scale rule: for every
    round(<expr>, k) (balanced parse), flag when k > 2 and <expr>
    contains a sum/avg/mean whose summand references a revenue column
    without an exact-grid cast."""
    out = []
    for m in re.finditer(round_pat, flat):
        args = _matched(flat, m.end() - 1)
        # decimal-snap form (money_round2): round(sum, grid) is
        # immediately re-snapped in DECIMAL — the documented tie-proof
        # convention, not a flap site
        tail = flat[m.end() - 1 + len(args) + 2 :]
        if re.match(
            r"\s*(as\s+decimal|\.cast\(\s*[\"']decimal)", tail, re.IGNORECASE
        ):
            continue
        parts = _top_level_split(args)
        if len(parts) < 2:
            continue
        km = re.fullmatch(r"\s*(\d+)\s*", parts[-1])
        if not km or int(km.group(1)) <= 2:
            continue
        k = int(km.group(1))
        expr = ",".join(parts[:-1])
        for am in re.finditer(agg_pat, expr):
            agg = am.group(1)
            summand = _matched(expr, am.end() - 1)
            if not re.search(_REVENUE_COLS, summand, re.IGNORECASE):
                continue
            if re.search(cast_pat, summand, re.IGNORECASE):
                continue  # exact-grid summand: order-independent
            out.append(label(agg, k))
            break
    return out


def lint_source(src: str, path: str) -> list[str]:
    flat = _strip(src)
    flags: list[str] = []
    for m in re.finditer(r"F\.round\(\s*F\.sum\(", flat):
        sum_open = m.end() - 1
        summand = _matched(flat, sum_open)
        after = flat[sum_open + len(summand) + 2 :]
        k = _outer_scale(after)
        if k is None:
            continue  # round's scale not a literal; out of scope
        # money_round2 / decimal-snap form: the ROUND output is re-rounded
        # in decimal by an enclosing F.round(....cast("decimal...
        ctx = flat[max(0, m.start() - 80) : m.start()]
        if "F.round(" in ctx and re.search(
            r"\.cast\(\s*[\"']decimal", flat[m.start() : m.start() + 600]
        ):
            continue
        inner = re.match(r"\s*F\.round\((.*)", summand)
        if inner:
            # sum of pre-snapped values: fine only if the outer scale
            # matches-or-exceeds the inner grid
            jm = re.search(r",\s*(\d+)\s*\)\s*$", summand)
            j = int(jm.group(1)) if jm else None
            if j is not None and k < j:
                flags.append(
                    f"{path}: round(sum(round(·,{j})),{k}) — snap the sum "
                    f"to the {j}dp grid in DECIMAL before rounding to {k}"
                )
            continue
        # product/HOF inside the sum → true grid finer than any single
        # column's; rounding the double sum at a literal scale ties
        if re.search(r"[*/]", summand):
            flags.append(
                f"{path}: round(sum(<product>),{k}) — use the "
                "money_round2 grid-snap convention (core_sql.py)"
            )
    # r13 rule (VERDICT r12 next-round #2, closing the
    # magnitude-vs-precision class registry-wide): ANY rounding finer
    # than cents whose rounded EXPRESSION contains a sum/avg over a
    # revenue-scale column. At sf0.1 these aggregates are
    # O(1e4)-O(1e10); k>2 demands 9-15 significant digits of
    # cross-engine agreement on an order-dependent parallel double sum
    # — the exact flap class that bit orders_ar1 and conformal in r12.
    # The rounded expression is extracted by BALANCED parse of the full
    # F.round(...) argument list (top-level comma split), so
    # manual-average shapes like round(sum(x)/count(*), 4) are caught,
    # not just round(agg(x), k) (r13 review finding). Exempt: summands
    # already on an exact grid (a bigint/decimal cents cast makes the
    # aggregate order-independent).
    flags += _revenue_scale_flags(
        flat,
        round_pat=r"F\.round\(",
        agg_pat=r"F\.(sum|avg|mean)\(",
        cast_pat=r"\.cast\(\s*[\"'](bigint|long|decimal)",
        label=lambda agg, k: (
            f"{path}: round(<expr with {agg}(<revenue-scale>)>,{k}) — "
            "money aggregates grid to cents: sum exact integer cents "
            "(cast bigint) or round to ≤2dp (VERDICT r12 #2)"
        ),
    )
    # r12 rule (the ar1/conformal flap class): a regression INTERCEPT
    # inherits y's scale — in this repo y is money-scale wherever an
    # intercept is emitted, so rounding it finer than cents demands
    # 10-15 significant digits of cross-engine agreement on a parallel
    # float aggregate. Slopes/r2 are dimensionless here and stay 6dp.
    for m in re.finditer(r"F\.round\(\s*F\.regr_intercept\(", flat):
        arg_open = m.end() - 1
        args = _matched(flat, arg_open)
        after = flat[arg_open + len(args) + 2 :]
        mk = re.match(r"\s*,\s*(\d+)\s*\)", after)
        if mk and int(mk.group(1)) > 2:
            flags.append(
                f"{path}: round(regr_intercept(·),{mk.group(1)}) — "
                "intercepts are y-scale; grid to cents (NOTES r12 #10)"
            )
    return flags


# Reviewed sites the exact-tie rules do not apply to. ann_rp_lsh_topk's
# round(sum(v*w), 6) is a SIGNED-projection dot product feeding a sign
# test: products of byte-identical doubles (parquet v, md5-derived w),
# true value on no decimal grid, so an exact .xxxxxx5 tie is
# measure-zero — only the registry-wide ε-class remains, and snapping
# each product to a grid would SHIFT the certified hash without making
# the sign boundary any sharper. (Builder side matches the oracle
# term-for-term.)
ALLOW = {"ann_rp_lsh_topk"}


def lint_oracle(sql: str, name: str) -> list[str]:
    if name in ALLOW:
        return []
    """Same shapes on the DuckDB-SQL side of each registered query: a
    snapped builder paired with a raw-rounded oracle diverges at some SF
    just the same."""
    flat = re.sub(r"--[^\n]*", "", sql)
    flat = re.sub(r"\s+", " ", flat).lower()
    flags: list[str] = []
    for m in re.finditer(r"round\(\s*sum\(", flat):
        sum_open = flat.index("(", m.start() + len("round(") - 1 + 1)
        # locate the sum's open paren precisely
        sum_open = m.end() - 1
        summand = _matched(flat, sum_open)
        after = flat[sum_open + len(summand) + 2 :]
        mk = re.match(r"\s*(?:over\s*\([^)]*\)\s*)?,\s*(\d+)\s*\)", after)
        if not mk:
            continue
        k = int(mk.group(1))
        # decimal-snap form: round(CAST(round(sum(...), g) AS DECIMAL...)
        ctx = flat[max(0, m.start() - 60) : m.start()]
        if "round(cast(round(" in flat[max(0, m.start() - 24) : m.start() + 24] or (
            "cast(round(" in ctx
        ):
            continue
        inner = re.match(r"\s*round\(", summand)
        if inner:
            jm = re.search(r",\s*(\d+)\s*\)\s*$", summand)
            j = int(jm.group(1)) if jm else None
            if j is not None and k < j:
                flags.append(
                    f"oracle[{name}]: round(sum(round(·,{j})),{k}) — snap "
                    f"the sum to the {j}dp grid in DECIMAL first"
                )
            continue
        if re.search(r"[*/]", summand):
            flags.append(
                f"oracle[{name}]: round(sum(<product>),{k}) — use the "
                "decimal grid-snap form"
            )
    # r13 revenue-scale rule, oracle side (mirrors lint_source; same
    # balanced-parse engine, so manual-average shapes are caught too).
    flags += _revenue_scale_flags(
        flat,
        round_pat=r"(?<![a-z_])round\(",
        agg_pat=r"(?<![a-z_])(sum|avg|mean)\(",
        cast_pat=r"as\s+(bigint|hugeint|decimal)|::(bigint|hugeint|decimal)",
        label=lambda agg, k: (
            f"oracle[{name}]: round(<expr with {agg}(<revenue-scale>)>,"
            f"{k}) — money aggregates grid to cents (VERDICT r12 #2)"
        ),
    )
    for m in re.finditer(r"round\(\s*regr_intercept\(", flat):
        arg_open = m.end() - 1
        args = _matched(flat, arg_open)
        after = flat[arg_open + len(args) + 2 :]
        mk = re.match(r"\s*,\s*(\d+)\s*\)", after)
        if mk and int(mk.group(1)) > 2:
            flags.append(
                f"oracle[{name}]: round(regr_intercept(·),{mk.group(1)})"
                " — intercepts are y-scale; grid to cents (NOTES r12 #10)"
            )
    return flags


def main() -> int:
    flags: list[str] = []
    for d in SCAN:
        for fn in sorted(os.listdir(d)):
            if not fn.endswith(".py"):
                continue
            p = os.path.join(d, fn)
            flags += lint_source(open(p).read(), os.path.relpath(p, ROOT))
    # oracle side: import the registry (no Spark session needed)
    sys.path.insert(0, ROOT)
    from ranger_spark.queries import load_all

    for name, spec in sorted(load_all().items()):
        if spec.oracle:
            flags += lint_oracle(spec.oracle, name)
    for f in flags:
        print("FLAG ", f)
    print(f"{len(flags)} flagged rounding sites")
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
