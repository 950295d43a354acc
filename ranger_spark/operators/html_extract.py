"""HTML main-content extraction — the boilerplate-removal step between a
WARC crawl payload and a clean training corpus (C4 / RefinedWeb style;
the step VERDICT r10 named as the one missing link in the
warc → text_quality/dedup/pack chain this repo otherwise owns).

Everything here is a composition of built-in column expressions —
``regexp_replace`` chains for the tag walk, higher-order functions
(``transform`` / ``filter`` / ``array_join``) for the per-line content
filter — so the operator is map-only, whole-stage-codegen'd JVM work
with zero Python in the path and zero shuffles: exactly the shape that
survives a 100-TB Common-Crawl sweep (each task strips its own WARC
payloads; no exchange, no state).

The extraction pipeline (public technique; C4's line filters per
Raffel et al. 2020 §2.2 and jusText/trafilatura-style link-density
boilerplate scoring):

1. drop ``<!-- -->`` comments and non-content subtrees wholesale
   (``script`` / ``style`` / ``noscript`` / ``svg`` / ``template`` —
   their text is never prose);
2. mark anchor text with sentinel bytes BEFORE stripping tags, so the
   per-line link density (fraction of visible chars that sit inside
   ``<a>``) survives the strip;
3. turn block-level boundaries (``p div li h1-6 tr table br hr`` …)
   into newlines — the line structure the content filter scores;
4. strip remaining tags, decode the common named entities
   (``&amp;`` LAST so decoding never cascades: ``&amp;lt;`` must
   yield the literal text ``&lt;``, not ``<``);
5. per line: collapse whitespace, then keep the line only if it has
   ≥ ``min_words`` words, ends in terminal punctuation (optional),
   and has link density ≤ ``max_link_density`` — navigation chrome is
   nearly 100% anchor text, prose nearly 0%.

Known regex-parser limits (documented, standard for this technique): a
``</script>`` inside a JS string literal ends the script block early; an
anchor with NO closing ``</a>`` at all never gets sentinels (the bare
``<a …>`` is stripped as a plain tag, so its text scores as prose — a
DOM parser's auto-close recovery is the per-row Python this operator
exists to avoid); lines strictly INSIDE an anchor that spans 3+ blocks
carry no sentinel and under-count. Dangling sentinels on the lines
where a cross-block anchor opens/closes DO count: the density score
treats an unpaired ``\\x01`` as anchored-to-end-of-line and an unpaired
``\\x02`` as anchored-from-start-of-line, so a nav block of multi-line
anchors can't pass the density filter on a technicality.

Reference parity note: gear6io/ranger has no HTML processing at all —
this module is part of the LLM-training-data extension surface (brief:
"operations a large-scale training-data pipeline would need").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# sentinel bytes marking anchor-text spans between tag-strip and the
# per-line density scoring (stripped from the input first, so payload
# bytes can never forge a span)
_SA = "\x01"
_SB = "\x02"

_NONCONTENT_RE = (
    r"(?is)<(script|style|noscript|svg|template)\b[^>]*>.*?</\1\s*>"
)
_COMMENT_RE = r"(?s)<!--.*?-->"
_ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a\s*>"
_BLOCK_RE = (
    r"(?i)</?(?:p|div|li|ul|ol|h[1-6]|tr|td|th|table|thead|tbody|"
    r"blockquote|pre|header|footer|nav|aside|section|article|title|"
    r"br|hr|form|fieldset|dl|dt|dd|figure|figcaption|main|address)"
    r"\b[^>]*/?\s*>"
)
_ANY_TAG_RE = r"<[^>]*>"
# decode order matters: &amp; LAST (see module docstring)
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)
_TERMINAL_PUNCT_RE = r"[.!?]['\"\)\]]*$"


def html_visible_text(col: Column | str) -> Column:
    """Tag-stripped, entity-decoded visible text with block-level tags
    as line breaks — no content filtering (the raw material the
    main-content filter scores). Lines keep document order; whitespace
    inside a line is collapsed; empty lines are dropped."""
    lines = _visible_lines(col)
    clean = F.transform(
        lines, lambda l: F.regexp_replace(l, f"[{_SA}{_SB}]", "")
    )
    return F.array_join(
        F.filter(clean, lambda t: t != F.lit("")), "\n"
    )


def html_main_content(
    col: Column | str,
    min_words: int = 3,
    require_terminal_punct: bool = True,
    max_link_density: float = 0.5,
) -> Column:
    """Main-content text of an HTML document: visible lines that pass
    the C4-style content filter (≥ ``min_words`` words, terminal
    punctuation if ``require_terminal_punct``, link density ≤
    ``max_link_density``), joined by newlines in document order.
    Composable Column expression — pure JVM, map-only."""
    kept = _kept_lines(
        col, min_words, require_terminal_punct, max_link_density
    )
    return F.array_join(kept, "\n")


def html_main_content_lines(
    col: Column | str,
    min_words: int = 3,
    require_terminal_punct: bool = True,
    max_link_density: float = 0.5,
) -> Column:
    """Array-of-lines variant of :func:`html_main_content` (for callers
    that count / explode kept lines without re-splitting)."""
    return _kept_lines(
        col, min_words, require_terminal_punct, max_link_density
    )


def html_scored_lines(
    col: Column | str,
    min_words: int = 3,
    require_terminal_punct: bool = True,
    max_link_density: float = 0.5,
) -> Column:
    """``array<struct<t: clean line, k: keep flag>>`` over the visible
    lines — ONE tag walk serving both the visible-text and main-content
    views. Callers needing both should alias this once and derive from
    the alias: Catalyst does not CSE repeated expression chains (same
    non-CSE note as operators/text.quality_metrics' ``toks``), so
    composing ``html_main_content_lines`` + ``html_visible_text`` on
    the raw column runs the ~13-pass regex chain twice per row."""
    return _scored_lines(
        col, min_words, require_terminal_punct, max_link_density
    )


def _visible_lines(col: Column | str) -> Column:
    """Lines of visible text with anchor spans sentinel-marked and
    per-line whitespace collapsed (sentinels still present)."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.regexp_replace(c, f"[{_SA}{_SB}]", "")  # forge-proofing
    s = F.regexp_replace(s, _COMMENT_RE, " ")
    s = F.regexp_replace(s, _NONCONTENT_RE, " ")
    s = F.regexp_replace(s, _ANCHOR_RE, _SA + "$1" + _SB)
    s = F.regexp_replace(s, _BLOCK_RE, "\n")
    s = F.regexp_replace(s, _ANY_TAG_RE, "")
    for ent, ch in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.transform(
        F.split(s, "\n"),
        lambda l: F.trim(F.regexp_replace(l, r"\s+", " ")),
    )


def _kept_lines(
    col: Column | str,
    min_words: int,
    require_terminal_punct: bool,
    max_link_density: float,
) -> Column:
    scored = _scored_lines(
        col, min_words, require_terminal_punct, max_link_density
    )
    return F.transform(F.filter(scored, lambda s: s["k"]), lambda s: s["t"])


def _scored_lines(
    col: Column | str,
    min_words: int,
    require_terminal_punct: bool,
    max_link_density: float,
) -> Column:
    lines = _visible_lines(col)

    def score(l: Column) -> Column:
        clean = F.regexp_replace(l, f"[{_SA}{_SB}]", "")
        paired_len = F.length(
            F.array_join(
                F.regexp_extract_all(
                    l, F.lit(f"{_SA}([^{_SA}{_SB}]*){_SB}"), F.lit(1)
                ),
                "",
            )
        )
        # dangling sentinels from cross-block anchors: an unpaired open
        # anchors to end-of-line, an unpaired close from start-of-line
        # (module docstring "Known regex-parser limits"). Work on the
        # residual with paired spans removed so paired text isn't
        # re-counted; cap at the clean length for pathological nesting.
        residual = F.regexp_replace(l, f"{_SA}[^{_SA}{_SB}]*{_SB}", "")
        open_tail = F.regexp_replace(
            F.regexp_extract(residual, f"{_SA}(.*)$", 1),
            f"[{_SA}{_SB}]",
            "",
        )
        close_head = F.regexp_replace(
            F.regexp_extract(residual, f"^(.*){_SB}", 1),
            f"[{_SA}{_SB}]",
            "",
        )
        anchor_len = F.least(
            paired_len + F.length(open_tail) + F.length(close_head),
            F.length(clean),
        )
        density = anchor_len / F.greatest(F.length(clean), F.lit(1))
        keep = (
            (clean != F.lit(""))
            & (F.size(F.split(clean, " ")) >= F.lit(min_words))
            & (density <= F.lit(float(max_link_density)))
        )
        if require_terminal_punct:
            keep = keep & clean.rlike(_TERMINAL_PUNCT_RE)
        return F.struct(clean.alias("t"), keep.alias("k"))

    return F.transform(lines, score)
