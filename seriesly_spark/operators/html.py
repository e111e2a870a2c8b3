"""HTML -> text main-content extraction — the first stage of the crawl
intake ladder (before language-ID / quality / dedup, which all assume
clean text). The shape is jusText's (Pomikalek 2011) / trafilatura's
block-scoring core reduced to its two load-bearing rules: segment the
page into text blocks at block-level tag boundaries, then drop
boilerplate blocks by LINK DENSITY (navigation, footers, tag clouds are
mostly anchor text) and MINIMUM LENGTH (titles, buttons, breadcrumbs).

Everything is JVM-side regexp/array expressions — no Python boundary,
whole-stage-codegen-friendly, and every rule replays verbatim in any
RE2-compatible SQL engine (the DuckDB oracle runs the SAME pipeline via
regexp_split_to_array + list_transform/list_filter), so the rule set
itself is value-checked cross-engine, not just the row plumbing.

Scale shape: purely per-row (narrow map, no shuffle, no UDF) — at
100 TB this runs at scan speed and composes with ``spread`` upstream
only if the input arrives in few partitions. Patterns deliberately
avoid backreferences so both Java regex and RE2 accept them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from seriesly_spark.operators.util import spread

# Script/style bodies and comments go first (their CONTENT must not
# leak into blocks); separate patterns because RE2 (the oracle engine)
# has no backreferences.
SCRIPT_PAT = r"(?is)<script[^>]*>.*?</script>"
STYLE_PAT = r"(?is)<style[^>]*>.*?</style>"
COMMENT_PAT = r"(?s)<!--.*?-->"

# Block-level boundaries: the HTML5 flow-content set that terminates a
# text run. Inline tags (a, b, i, span, em, code, ...) stay inside the
# block so link density can be measured before they are stripped.
BLOCK_PAT = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tfoot"
    r"|tr|td|th|br|hr|section|article|header|footer|nav|aside"
    r"|blockquote|pre|form|fieldset|figure|figcaption|main|address"
    r"|title|body|html|head)\b[^>]*>"
)

LINK_PAT = r"(?is)<a\b[^>]*>(.*?)</a>"
TAG_PAT = r"<[^>]+>"

# Minimal entity set, applied AFTER tag-stripping; &amp; is decoded
# LAST so double-escaped text ("&amp;lt;") decodes exactly one level.
ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def _norm(col: Column) -> Column:
    """Tag-strip -> entity-decode -> whitespace-collapse -> trim; the
    one normalization both block text and anchor text go through."""
    s = F.regexp_replace(col, TAG_PAT, " ")
    for ent, ch in ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def html_extract(
    docs: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_chars: int = 25,
    max_link_density: float = 0.33,
) -> DataFrame:
    """Extract main content from raw HTML pages.

    A block is KEPT iff its normalized text has at least ``min_chars``
    characters AND its link density (normalized anchor-text chars /
    normalized block chars) is at most ``max_link_density`` — the
    jusText "short" and "bad-by-links" rules; navigation bars and
    footers are near-100% anchor text and fall to the density rule
    even when long.

    Output: (id_col, n_blocks, n_kept, n_chars, text) where n_blocks
    counts non-empty text blocks, text joins kept blocks with
    newlines, and n_chars = length(text). NULL html yields NULL
    metrics (no silent empty-page coercion — callers quarantine).
    """
    # Regex segmentation + per-block scoring is heavy per row; a
    # compact input (one parquet file) would serialize it on one core.
    docs = spread(docs)
    c = F.col(html_col)
    for pat in (SCRIPT_PAT, STYLE_PAT, COMMENT_PAT):
        c = F.regexp_replace(c, pat, " ")
    scored = F.transform(
        F.split(c, BLOCK_PAT),
        lambda b: F.struct(
            _norm(b).alias("t"),
            F.length(
                _norm(
                    F.array_join(
                        F.regexp_extract_all(b, F.lit(LINK_PAT), F.lit(1)),
                        " ",
                    )
                )
            ).alias("nl"),
        ),
    )
    kept = F.filter(
        scored,
        lambda e: (F.length(e["t"]) >= min_chars)
        & (
            e["nl"].cast("double")
            <= F.length(e["t"]) * F.lit(float(max_link_density))
        ),
    )
    text = F.array_join(F.transform(kept, lambda e: e["t"]), "\n")
    return docs.select(
        F.col(id_col),
        F.size(
            F.filter(scored, lambda e: F.length(e["t"]) > 0)
        ).alias("n_blocks"),
        F.size(kept).alias("n_kept"),
        F.length(text).alias("n_chars"),
        text.alias("text"),
    )
