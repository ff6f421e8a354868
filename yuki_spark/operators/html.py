"""HTML main-content extraction — the ingestion step in front of every
web-corpus pipeline (the trafilatura/jusText shape, reduced to its
deterministic core): tag-segment the markup into blocks, strip tags,
and keep the content blocks while dropping boilerplate by STRUCTURAL
rules (chrome elements like nav/footer/title) and by TEXT-DENSITY
rules (link-bearing or empty blocks). Everything is native Spark
string/regex algebra — no Python in the pipeline — and every rule is
chosen to be bit-identically replayable in DuckDB (Java regex and RE2
agree on the constructs used: alternation, character classes, ``\\b``,
non-greedy is avoided entirely).

The corpus ships no real HTML, so :func:`synth_html` wraps each
document's text in a deterministic page skeleton (head/title + nav
chrome + one ``<p>`` per sentence + a link-only "related" paragraph +
footer) — giving the extractor real chrome to strip, a real
link-density positive, and a recoverable body whose extraction the
oracle verifies end-to-end. On real crawl data only ``synth_html``
is replaced by the fetcher's payload.

Scale shape: one linear projection (synthesis), one bounded explode
(a page's block count is page-sized, not corpus-sized), one hash
aggregation back to page grain. No shuffle other than the final
groupBy(doc_id); no UDFs anywhere.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Block-opening tags that start a new segment. \x01 never occurs in
# text (the corpus is printable words), and the operator would only
# over-segment, never corrupt, if it did.
_SEG = ""
_BLOCK_TAGS = "p|nav|footer|title"

# chrome elements whose blocks are boilerplate regardless of content
BOILERPLATE_TAGS = ("nav", "footer", "title", "html", "head", "body")


def synth_html(docs: DataFrame) -> DataFrame:
    """(doc_id, html): deterministic page skeleton around the text —
    title + nav chrome, one ``<p>`` per '. '-sentence, a link-only
    related-reading paragraph, a footer. Pure string algebra (plain
    replace, no regex) so the DuckDB twin is trivially identical."""
    paras = F.concat(
        F.lit("<p>"),
        F.replace(F.col("text"), F.lit(". "), F.lit(".</p><p>")),
        F.lit("</p>"),
    )
    html = F.concat(
        F.lit("<html><head><title>doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title></head><body>"),
        F.lit('<nav><a href="/">home</a> <a href="/about">about</a></nav>'),
        paras,
        F.lit('<p>related: <a href="/r">more</a></p>'),
        F.lit(
            '<footer><a href="/tos">terms</a> copyright example corp'
            "</footer></body></html>"
        ),
    )
    return docs.select("doc_id", html.alias("html"))


def html_blocks(pages: DataFrame) -> DataFrame:
    """Segment (doc_id, html) into per-block rows: (doc_id, pos, tag,
    btext, n_links, keep). Blocks open at every p/nav/footer/title
    tag; ``btext`` is the tag-stripped, space-collapsed text;
    ``n_links`` counts anchors; ``keep`` is the extraction rule —
    a content block is a ``<p>`` with no links and non-empty text
    (the density heuristic's deterministic core: chrome tags are
    structural boilerplate, link-bearing paragraphs are navigational
    boilerplate, empty paragraphs are noise)."""
    marked = F.regexp_replace(
        "html", f"<({_BLOCK_TAGS})\\b", _SEG + "<$1"
    )
    ex = pages.select(
        "doc_id", F.posexplode(F.split(marked, _SEG)).alias("pos", "block")
    )
    tag = F.regexp_extract("block", "^<([a-z]+)", 1)
    btext = F.trim(
        F.regexp_replace(
            F.regexp_replace("block", "<[^>]*>", " "), " +", " "
        )
    )
    n_links = (
        (
            F.length("block")
            - F.length(F.replace(F.col("block"), F.lit("<a "), F.lit("")))
        )
        / 3
    ).cast("long")
    out = ex.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        tag.alias("tag"),
        btext.alias("btext"),
        n_links.alias("n_links"),
    )
    keep = (
        (F.col("tag") == "p")
        & (F.col("n_links") == 0)
        & (F.length("btext") >= 1)
    )
    return out.withColumn("keep", keep)


def _extracted_expr():
    """The kept-blocks-joined-in-document-order aggregate expression —
    one definition shared by the d51 report and the curation
    pipeline's text-replacement stage. Order rides array_sort over
    (pos, btext) structs, not a window."""
    kept_structs = F.array_sort(
        F.collect_list(
            F.when(F.col("keep"), F.struct("pos", "btext"))
        )
    )
    return F.concat_ws(
        " ", F.transform(kept_structs, lambda x: x["btext"])
    )


def extract_main_text(pages: DataFrame) -> DataFrame:
    """Page-grain extraction report over :func:`html_blocks`:
    (doc_id, n_blocks, n_kept, n_links, extracted_len, extracted_md5)
    where the extracted text is the kept blocks joined in document
    order — the column a downstream quality/filter pass (d6/d23)
    consumes in place of raw text. One hash aggregation."""
    b = html_blocks(pages)
    extracted = _extracted_expr()
    return (
        b.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.sum("n_links").alias("n_links"),
            F.length(extracted).cast("bigint").alias("extracted_len"),
            F.md5(extracted).alias("extracted_md5"),
        )
    )


def extract_text(pages: DataFrame) -> DataFrame:
    """(doc_id, text): the extracted main text itself — what a real
    web-corpus pipeline feeds its downstream quality/dedup stages in
    place of the raw page (d51 reports on the extraction; this is the
    materialization the curation pipeline consumes). Same aggregate
    as :func:`extract_main_text`, projected to the text column."""
    return (
        html_blocks(pages)
        .groupBy("doc_id")
        .agg(_extracted_expr().alias("text"))
    )
