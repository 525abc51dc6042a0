"""HTML text extraction: the web-crawl ingest step (C4 / CCNet lineage).

A pretraining pipeline's very first transform is HTML -> text: drop
script/style payloads and chrome (nav/footer), strip tags, decode
entities, collapse whitespace — plus the quality signals that ride along
(link count, text-to-markup ratio) which downstream filters cut on
(C4 drops pages with too little text per markup; link-dense pages are
lists/menus, not prose).

Everything here is Catalyst-native string/regex expression work — the
whole extraction is whole-stage-codegen'd map work with NO Python in the
row path, which is the correct 100 TB shape for a transform that touches
every crawled byte. Regexes are restricted to the Java-regex/RE2 common
dialect ((?s), lazy quantifiers, character classes — no backreferences or
lookaround) so the DuckDB oracle replays them verbatim.

The testdata has no raw-HTML table, so the catalog entry wraps each
document in deterministic synthetic HTML first (escaped text inside real
chrome: head/title, a script, a style block, nav and footer boilerplate,
inline links) — the documents_as_png convention: the input derives from
text, so a SQL oracle can verify the FULL wrap -> extract round trip
value-for-value, including that extraction recovers the original text
exactly (``roundtrip_ok``).

No reference counterpart (the reference delegates all row-level compute,
`/root/reference/src/fsql/deser.py:30-31`); driver-mandated extension
surface (SURVEY §2.6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: block elements whose entire CONTENT is boilerplate/payload, not prose
_DROP_BLOCKS = ("script", "style", "nav", "footer")


def _escape_html(col: Column) -> Column:
    # & first (standard escaping order), then the angle brackets
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    return F.replace(out, F.lit(">"), F.lit("&gt;"))


def _unescape_html(col: Column) -> Column:
    # named/numeric entities first, &amp; LAST (the inverse escaping order)
    out = F.replace(col, F.lit("&lt;"), F.lit("<"))
    out = F.replace(out, F.lit("&gt;"), F.lit(">"))
    out = F.replace(out, F.lit("&quot;"), F.lit('"'))
    out = F.replace(out, F.lit("&#39;"), F.lit("'"))
    out = F.replace(out, F.lit("&nbsp;"), F.lit(" "))
    return F.replace(out, F.lit("&amp;"), F.lit("&"))


def html_page_expr(
    doc_id: Column, source: Column, text: Column, n_docs: int | None = None
) -> Column:
    """The synthetic page as a pure Column expression — shared by the batch
    table builder and the streaming twin (expressions run unmodified on a
    readStream). With ``n_docs`` set, the body gains a deterministic
    'see also' paragraph linking to docs ``(id*7+1) % n`` and
    ``(id*13+5) % n`` — the cross-page hyperlinks a link-graph pipeline
    extracts (see :func:`extract_links`); None keeps the page byte-stable
    for the extraction round-trip entries."""
    see_also: tuple[Column, ...] = ()
    if n_docs is not None:
        t1 = F.pmod(doc_id * 7 + 1, F.lit(n_docs)).cast("string")
        t2 = F.pmod(doc_id * 13 + 5, F.lit(n_docs)).cast("string")
        see_also = (
            F.lit('<p>see also <a href="/doc/'), t1, F.lit('">doc '), t1,
            F.lit('</a> and <a href="/doc/'), t2, F.lit('">doc '), t2,
            F.lit("</a></p>"),
        )
    return F.concat(
        F.lit("<!DOCTYPE html><html><head><title>Doc "),
        doc_id.cast("string"),
        F.lit(" &mdash; "),
        source,
        F.lit("</title><script>var pageId="),
        doc_id.cast("string"),
        F.lit(";track(pageId);</script><style>body{margin:0} p{font:14px serif}</style>"),
        F.lit('</head><body><nav><a href="/">home</a> <a href="/about">about</a></nav>'),
        F.lit("<h1>Doc "),
        doc_id.cast("string"),
        F.lit("</h1>\n<p>"),
        _escape_html(text),
        F.lit("</p>\n"),
        *see_also,
        F.lit('<footer>&copy; '),
        source,
        F.lit(' &nbsp;<a href="/terms">terms</a></footer></body></html>'),
    )


def documents_as_html(
    spark: SparkSession, sf: str, cross_links: bool = False
) -> DataFrame:
    """(doc_id, html): each document rendered as a deterministic synthetic
    page — escaped text in a <p>, plus the chrome a real crawl page carries
    (title, script, style, nav with links, h1, footer). Pure expression
    work; the page derives from text so oracles can replay it.
    ``cross_links`` adds the deterministic 'see also' hyperlinks (one cheap
    count fixes the modulus)."""
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    n_docs = docs.count() if cross_links else None
    return docs.select(
        "doc_id",
        html_page_expr(
            F.col("doc_id"), F.col("source"), F.col("text"), n_docs=n_docs
        ).alias("html"),
    )


def extract_links(df: DataFrame, html_col: str = "html") -> DataFrame:
    """One row per <a href="..."> occurrence: input columns + ``href`` —
    the crawl link-graph feed (build the host/page graph, then rank it;
    see q_link_graph_pagerank). Catalyst regexp_extract_all + explode,
    map-only, Java/RE2-common dialect."""
    hrefs = F.expr(
        f"""regexp_extract_all({html_col}, '<a href="([^"]+)"', 1)"""
    )
    return df.select("*", F.explode(hrefs).alias("href"))


def extract_html_text(
    df: DataFrame, html_col: str = "html"
) -> DataFrame:
    """Input columns + (title, text, n_links, html_len, text_len):
    title = <title> content; text = prose after dropping script/style/nav/
    footer blocks, stripping tags, decoding entities, and collapsing
    whitespace; n_links counts <a tags in the FULL page (link density is a
    pre-strip quality signal). All Catalyst expressions — map-only."""
    html = F.col(html_col)
    title = _unescape_html(
        F.regexp_extract(html, "(?s)<title[^>]*>(.*?)</title>", 1)
    )
    body = html
    for tag in _DROP_BLOCKS:
        body = F.regexp_replace(body, f"(?s)<{tag}[^>]*>.*?</{tag}>", " ")
    # <head> remnants (title/meta) are chrome too
    body = F.regexp_replace(body, "(?s)<head[^>]*>.*?</head>", " ")
    text = F.regexp_replace(body, "<[^>]+>", " ")
    text = _unescape_html(text)
    text = F.trim(F.regexp_replace(text, "\\s+", " "))
    n_links = (
        (F.length(html) - F.length(F.replace(html, F.lit("<a "), F.lit(""))))
        / F.lit(3)
    ).cast("int")
    return df.select(
        "*",
        title.alias("title"),
        text.alias("text_extracted"),
        n_links.alias("n_links"),
        F.length(html).alias("html_len"),
    ).withColumn("text_len", F.length("text_extracted"))


# --------------------------------------------------------------------------
# catalog entry + oracle
# --------------------------------------------------------------------------


def q_html_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Wrap every document in synthetic crawl HTML, extract it back, and
    report the extraction + its quality signals: title, link count,
    text-to-markup ratio (exact integer basis points), and the exact round-trip check — extracted
    prose must equal 'Doc {id} ' + the whitespace-collapsed original text
    (h1 heading + paragraph), proving tag-strip/entity/whitespace handling
    byte-for-byte."""
    pages = documents_as_html(spark, sf)
    out = extract_html_text(pages, "html")
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", F.col("text").alias("_orig")
    )
    want = F.concat(
        F.lit("Doc "),
        F.col("doc_id").cast("string"),
        F.lit(" "),
        F.trim(F.regexp_replace(F.col("_orig"), "\\s+", " ")),
    )
    return (
        out.join(docs, "doc_id")
        .select(
            "doc_id",
            "title",
            "n_links",
            "html_len",
            "text_len",
            # integer basis points, not round(a/b, 4): a small-denominator
            # rational lands exactly on .xxxx5, where Spark (decimal HALF_UP)
            # and DuckDB (binary-double rounding) disagree by one ulp
            F.expr("CAST(text_len * 10000 DIV html_len AS INT)").alias("text_ratio_bp"),
            (F.col("text_extracted") == F.trim(want)).alias("roundtrip_ok"),
        )
        .orderBy("doc_id")
    )


Q_HTML_EXTRACT_SQL = """
WITH pages AS (
  SELECT doc_id, source, text,
         '<!DOCTYPE html><html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
         || ' &mdash; ' || source
         || '</title><script>var pageId=' || CAST(doc_id AS VARCHAR)
         || ';track(pageId);</script><style>body{margin:0} p{font:14px serif}</style>'
         || '</head><body><nav><a href="/">home</a> <a href="/about">about</a></nav>'
         || '<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>' || chr(10) || '<p>'
         || replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')
         || '</p>' || chr(10) || '<footer>&copy; ' || source
         || ' &nbsp;<a href="/terms">terms</a></footer></body></html>' AS html
  FROM documents
),
stripped AS (
  SELECT doc_id, html, text,
         regexp_extract(html, '(?s)<title[^>]*>(.*?)</title>', 1) AS title_raw,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(html, '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
                 '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
               '(?s)<nav[^>]*>.*?</nav>', ' ', 'g'),
             '(?s)<footer[^>]*>.*?</footer>', ' ', 'g'),
           '(?s)<head[^>]*>.*?</head>', ' ', 'g') AS body
  FROM pages
),
extracted AS (
  SELECT doc_id, html, text,
         replace(replace(replace(replace(replace(replace(title_raw,
           '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
           '&nbsp;', ' '), '&amp;', '&') AS title,
         trim(regexp_replace(
           replace(replace(replace(replace(replace(replace(
             regexp_replace(body, '<[^>]+>', ' ', 'g'),
             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
             '&nbsp;', ' '), '&amp;', '&'),
           '\\s+', ' ', 'g')) AS text_extracted,
         CAST((length(html) - length(replace(html, '<a ', ''))) / 3 AS INTEGER) AS n_links,
         length(html) AS html_len
  FROM stripped
)
SELECT doc_id, title, n_links, html_len,
       length(text_extracted) AS text_len,
       CAST(length(text_extracted) * 10000 // html_len AS INTEGER) AS text_ratio_bp,
       (text_extracted = trim('Doc ' || CAST(doc_id AS VARCHAR) || ' '
                              || trim(regexp_replace(text, '\\s+', ' ', 'g'))))
         AS roundtrip_ok
FROM extracted
ORDER BY doc_id
"""


def extract_doc_link_anchors(df: DataFrame, html_col: str = "html") -> DataFrame:
    """One row per /doc/<id> hyperlink: input columns + (target, anchor) —
    href target id and the link's anchor TEXT, the classic inlink ranking/
    retrieval signal (anchor text describes the TARGET page better than the
    target's own body; BM25F's anchor field). Two positional
    regexp_extract_all passes (group 1 = id, group 2 = text) zipped in
    lockstep — matches come back in document order in both engines."""
    pat = '<a href="/doc/([0-9]+)">([^<]*)</a>'
    zipped = F.arrays_zip(
        F.expr(f"regexp_extract_all({html_col}, '{pat}', 1)"),
        F.expr(f"regexp_extract_all({html_col}, '{pat}', 2)"),
    )
    return (
        df.select("*", F.explode(zipped).alias("_m"))
        .select("*", F.col("_m.0").cast("long").alias("target"),
                F.col("_m.1").alias("anchor"))
        .drop("_m")
    )


def q_link_anchor_texts(spark: SparkSession, sf: str) -> DataFrame:
    """Inlink anchor-text aggregation over the cross-linked synthetic crawl:
    per target page, how many inlinks, from how many distinct source pages,
    and the sorted-distinct anchor vocabulary — the signal a retrieval
    pipeline indexes as the anchor field. One map-side extraction + one
    aggregate; the oracle replays the two-group zip extraction with
    DuckDB's lockstep unnest."""
    pages = documents_as_html(spark, sf, cross_links=True)
    anchors = extract_doc_link_anchors(pages, "html")
    return (
        anchors.groupBy(F.col("target").alias("target_doc"))
        .agg(
            F.count(F.lit(1)).alias("n_inlinks"),
            F.countDistinct("doc_id").alias("n_sources"),
            F.array_join(F.array_sort(F.collect_set("anchor")), "|").alias("anchor_terms"),
        )
        .orderBy("target_doc")
    )


Q_LINK_ANCHORS_SQL = """
WITH nn0 AS (SELECT COUNT(*) AS c FROM documents),
pages AS (
  SELECT doc_id,
         '<p>see also <a href="/doc/' || CAST((doc_id * 7 + 1) % (SELECT c FROM nn0) AS VARCHAR)
         || '">doc ' || CAST((doc_id * 7 + 1) % (SELECT c FROM nn0) AS VARCHAR)
         || '</a> and <a href="/doc/' || CAST((doc_id * 13 + 5) % (SELECT c FROM nn0) AS VARCHAR)
         || '">doc ' || CAST((doc_id * 13 + 5) % (SELECT c FROM nn0) AS VARCHAR)
         || '</a></p>' AS body
  FROM documents
),
anchors AS (
  SELECT doc_id,
         CAST(unnest(regexp_extract_all(body, '<a href="/doc/([0-9]+)">([^<]*)</a>', 1)) AS BIGINT) AS target,
         unnest(regexp_extract_all(body, '<a href="/doc/([0-9]+)">([^<]*)</a>', 2)) AS anchor
  FROM pages
)
SELECT target AS target_doc,
       CAST(COUNT(*) AS BIGINT) AS n_inlinks,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_sources,
       array_to_string(list_sort(list_distinct(list(anchor))), '|') AS anchor_terms
FROM anchors
GROUP BY target
ORDER BY target_doc
"""



HTML_QUERIES = {
    "q_html_extract": q_html_extract,
    "q_link_anchor_texts": q_link_anchor_texts,
}
HTML_ORACLES = {
    "q_html_extract": Q_HTML_EXTRACT_SQL,
    "q_link_anchor_texts": Q_LINK_ANCHORS_SQL,
}
