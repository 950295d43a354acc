"""HTML main-content extraction (operators/html_extract.py): the tag
walk, entity decoding, and each line-filter rule on handcrafted pages,
plus the WARC → extract → quality end-to-end chain the operator exists
to complete (VERDICT r10 next-round #1)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ranger_spark.operators.html_extract import (
    html_main_content,
    html_main_content_lines,
    html_visible_text,
)


def _extract(spark, html: str, **kw) -> str:
    df = spark.createDataFrame([(html,)], "h string")
    return df.select(html_main_content("h", **kw).alias("m")).collect()[0].m


def _visible(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "h string")
    return df.select(html_visible_text("h").alias("v")).collect()[0].v


class TestTagWalk:
    def test_script_style_removed_wholesale(self, spark):
        h = (
            "<script>var s = 'prose that would pass every filter.';"
            "</script><style>p{}</style><p>Real content stays right "
            "here for you.</p>"
        )
        assert _extract(spark, h) == "Real content stays right here for you."

    def test_script_containing_markup_in_string(self, spark):
        h = '<script>x="<p>fake paragraph inside js.</p>"</script><p>Kept line of text here.</p>'
        assert _extract(spark, h) == "Kept line of text here."

    def test_comments_removed(self, spark):
        h = "<!-- a comment with <p>tags</p> inside --><p>Visible prose survives the comment strip.</p>"
        assert _extract(spark, h) == "Visible prose survives the comment strip."

    def test_block_tags_make_line_breaks(self, spark):
        h = "<div>First block line stays intact.</div><div>Second block line stays intact.</div>"
        assert _extract(spark, h) == (
            "First block line stays intact.\nSecond block line stays intact."
        )

    def test_inline_tags_do_not_break_lines(self, spark):
        h = "<p>Emphasis <em>inside</em> a <b>single</b> line works.</p>"
        assert _extract(spark, h) == "Emphasis inside a single line works."

    def test_whitespace_collapsed_per_line(self, spark):
        h = "<p>spaced   out\t words   collapse  to singles.</p>"
        assert _extract(spark, h) == "spaced out words collapse to singles."

    def test_case_insensitive_tags(self, spark):
        h = "<SCRIPT>dropped();</SCRIPT><P>Uppercase tags behave the same way.</P>"
        assert _extract(spark, h) == "Uppercase tags behave the same way."


class TestEntities:
    def test_common_entities_decoded(self, spark):
        h = "<p>Fish &amp; chips cost &lt;5&gt; &quot;pounds&quot; &#39;here&#39;.</p>"
        assert _extract(spark, h) == "Fish & chips cost <5> \"pounds\" 'here'."

    def test_amp_decoded_last_no_cascade(self, spark):
        # &amp;lt; is the TEXT "&lt;" — decoding must not cascade to "<"
        h = "<p>The escape &amp;lt; renders as four characters.</p>"
        assert _extract(spark, h) == "The escape &lt; renders as four characters."

    def test_nbsp_becomes_space(self, spark):
        h = "<p>non&nbsp;breaking&nbsp;spaces become plain ones.</p>"
        assert _extract(spark, h) == "non breaking spaces become plain ones."


class TestLineFilter:
    def test_min_words_drops_short_lines(self, spark):
        h = "<p>Too short.</p><p>This line is long enough to keep.</p>"
        assert _extract(spark, h, min_words=4) == (
            "This line is long enough to keep."
        )

    def test_terminal_punctuation_required(self, spark):
        h = "<p>Headline without any punctuation</p><p>A sentence that ends properly.</p>"
        assert _extract(spark, h) == "A sentence that ends properly."

    def test_terminal_punctuation_optional(self, spark):
        h = "<p>Headline without any punctuation</p>"
        assert _extract(spark, h, require_terminal_punct=False) == (
            "Headline without any punctuation"
        )

    def test_quote_after_punct_counts_as_terminal(self, spark):
        h = "<p>He said \"this still ends the line.\"</p>"
        assert _extract(spark, h) == 'He said "this still ends the line."'

    def test_link_density_drops_nav(self, spark):
        h = (
            '<p><a href="/a">Browse all categories now.</a> '
            '<a href="/b">More links over here.</a></p>'
            "<p>Prose with a single <a href='/x'>link</a> inside survives fine.</p>"
        )
        assert _extract(spark, h) == (
            "Prose with a single link inside survives fine."
        )

    def test_link_density_threshold_configurable(self, spark):
        h = '<p><a href="/a">All of this line is one anchor text.</a></p>'
        assert _extract(spark, h) == ""
        assert _extract(spark, h, max_link_density=1.0) == (
            "All of this line is one anchor text."
        )

    def test_sentinel_bytes_in_input_cannot_forge_spans(self, spark):
        # payload bytes \x01/\x02 are stripped before anchor marking
        h = "<p>Payload \x01noise\x02 cannot fake anchor density here.</p>"
        assert _extract(spark, h) == (
            "Payload noise cannot fake anchor density here."
        )

    def test_empty_and_all_boilerplate_page(self, spark):
        assert _extract(spark, "") == ""
        assert _extract(spark, "<nav><a href='/'>Home</a></nav>") == ""

    def test_null_html_yields_null(self, spark):
        df = spark.createDataFrame([(None,)], "h string")
        assert df.select(html_main_content("h").alias("m")).collect()[0].m is None


class TestVisibleText:
    def test_visible_keeps_boilerplate_lines(self, spark):
        h = "<title>Doc 1</title><p>Body text of the page right here.</p>"
        assert _visible(spark, h) == (
            "Doc 1\nBody text of the page right here."
        )

    def test_lines_variant_matches_joined(self, spark):
        h = "<p>First kept line of prose.</p><p>Second kept line of prose.</p>"
        df = spark.createDataFrame([(h,)], "h string")
        row = df.select(
            html_main_content_lines("h").alias("a"),
            html_main_content("h").alias("m"),
        ).collect()[0]
        assert "\n".join(row.a) == row.m


class TestPlanShape:
    def test_map_only_no_python_no_exchange(self, spark):
        df = spark.range(10).select(
            F.concat(
                F.lit("<p>row "), F.col("id").cast("string"), F.lit(" text.</p>")
            ).alias("h")
        )
        plan = (
            df.select(html_main_content("h").alias("m"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "Python" not in plan


@pytest.fixture(scope="module")
def warc_corpus_dir(spark, tmp_path_factory):
    """A small .warc.gz landing zone of synthetic HTML response records."""
    from ranger_spark.sources.warc_datasource import register_warc_source

    register_warc_source(spark)
    out = str(tmp_path_factory.mktemp("warc_html"))
    pages = spark.range(40).select(
        F.lit("response").alias("rec_type"),
        F.concat(F.lit("<urn:test:"), F.col("id").cast("string"), F.lit(">")).alias(
            "record_id"
        ),
        F.concat(F.lit("http://ex.com/"), F.col("id").cast("string")).alias(
            "target_uri"
        ),
        F.lit("2024-01-01T00:00:00Z").alias("warc_date"),
        F.encode(
            F.concat(
                F.lit(
                    "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                    "<html><head><title>t</title><script>s()</script></head>"
                    "<body><nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
                    "<p>Document body number "
                ),
                F.col("id").cast("string"),
                F.lit(
                    " carries enough words to pass the content filter.</p>"
                    "<p>Click here</p></body></html>"
                ),
            ),
            "utf-8",
        ).alias("payload"),
    )
    pages.repartition(2).write.format("warc").mode("append").save(out)
    return out


class TestWarcToCorpusChain:
    """The end-to-end chain the operator completes: warc source (HTTP
    headers stripped, status pushed down) → main-content extraction →
    quality metrics — zero Python, zero shuffles until the analyst
    aggregates."""

    def test_warc_extract_quality_pipeline(self, spark, warc_corpus_dir):
        from ranger_spark.operators.text import quality_metrics

        docs = (
            spark.read.format("warc")
            .option("strip_http_headers", "true")
            .load(warc_corpus_dir)
            .filter(F.col("http_status") == 200)
            .select(
                F.col("target_uri"),
                html_main_content(
                    F.decode(F.col("payload"), "utf-8")
                ).alias("text"),
            )
        )
        q = quality_metrics(F.col("text"))
        scored = docs.select(
            "target_uri", "text", *(v.alias(k) for k, v in q.items())
        )
        rows = scored.collect()
        assert len(rows) == 40
        for r in rows:
            assert r.text.startswith("Document body number ")
            assert "Click here" not in r.text
            assert "Home" not in r.text  # nav dropped by link density
            assert r.n_tokens >= 10

    def test_chain_plan_is_map_only(self, spark, warc_corpus_dir):
        df = (
            spark.read.format("warc")
            .option("strip_http_headers", "true")
            .load(warc_corpus_dir)
            .select(
                html_main_content(F.decode(F.col("payload"), "utf-8")).alias(
                    "text"
                )
            )
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestScoredLines:
    def test_scored_lines_single_walk_derivations_match(self, spark):
        """html_scored_lines is the one-tag-walk base: main-content and
        visible-text derived from its alias must equal the direct
        operators (r11 review finding: composing both on the raw column
        ran the regex chain twice — Catalyst does not CSE it)."""
        from ranger_spark.operators.html_extract import html_scored_lines

        h = (
            "<title>Doc 1</title><nav><a href='/'>Home page link.</a>"
            "</nav><p>Kept prose line stays here.</p><p>short</p>"
        )
        df = spark.createDataFrame([(h,)], "h string").select(
            html_scored_lines("h").alias("s"),
            html_main_content("h").alias("direct_main"),
            html_visible_text("h").alias("direct_vis"),
        )
        row = df.select(
            F.array_join(
                F.transform(
                    F.filter("s", lambda x: x["k"]), lambda x: x["t"]
                ),
                "\n",
            ).alias("m"),
            F.array_join(
                F.filter(
                    F.transform("s", lambda x: x["t"]),
                    lambda t: t != F.lit(""),
                ),
                "\n",
            ).alias("v"),
            "direct_main",
            "direct_vis",
        ).collect()[0]
        assert row.m == row.direct_main == "Kept prose line stays here."
        assert row.v == row.direct_vis
        assert row.v.splitlines() == [
            "Doc 1",
            "Home page link.",
            "Kept prose line stays here.",
            "short",
        ]


class TestCrossBlockAnchorDensity:
    # r11 advice: dangling sentinels from an anchor spanning a block
    # boundary must still count toward link density on the open/close
    # lines — nav chrome built from multi-line anchors can't slip past
    # the density filter on a pairing technicality
    def test_cross_block_anchor_counts_on_both_lines(self, spark):
        h = (
            "<p><a href='/a'>Browse all categories here"
            "<p>and even more listing pages now.</a></p>"
            "<p>Real prose stays in the corpus because it is not a link.</p>"
        )
        assert _extract(spark, h) == (
            "Real prose stays in the corpus because it is not a link."
        )

    def test_unclosed_anchor_documented_limit(self, spark):
        # no </a> at all -> the bare <a> is stripped as a plain tag and
        # the text scores as prose (documented regex-parser limit)
        h = "<p><a href='/x'>Navigation words that look like prose here.</p>"
        assert _extract(spark, h) == (
            "Navigation words that look like prose here."
        )
