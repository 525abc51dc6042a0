"""HTML extraction (html.py): adversarial known-answer tests — hostile
text inside pages (escaped tags/entities must round-trip, not execute),
multi-block drops, entity decode ordering, and the quality signals."""

from __future__ import annotations

from fsql_spark.operators import extract_html_text


def _extract(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return extract_html_text(df, "html").collect()[0]


def test_strips_tags_and_collapses_whitespace(spark):
    r = _extract(spark, "<html><body><h1>A</h1>\n\n  <p>b   c</p></body></html>")
    assert r["text_extracted"] == "A b c"
    assert r["text_len"] == 5


def test_drops_every_boilerplate_block_everywhere(spark):
    html = (
        "<body><script>x=1;</script>keep1"
        "<style>.a{}</style>keep2"
        "<nav><a href='/'>menu</a></nav>keep3"
        "<footer>fine print</footer>keep4"
        "<script \nasync>y=2;</script>keep5</body>"
    )
    r = _extract(spark, html)
    assert r["text_extracted"] == "keep1 keep2 keep3 keep4 keep5"


def test_escaped_markup_in_content_is_data_not_structure(spark):
    # a page whose PROSE contains markup-looking text, properly escaped:
    # extraction must return the literal text, not drop it as a block
    html = "<body><p>use &lt;script&gt;alert(1)&lt;/script&gt; &amp; enjoy</p></body>"
    r = _extract(spark, html)
    assert r["text_extracted"] == "use <script>alert(1)</script> & enjoy"


def test_double_escaped_entity_decodes_one_level(spark):
    # '&amp;lt;' is the ESCAPED text '&lt;' — must decode to '&lt;', not '<'
    r = _extract(spark, "<body><p>&amp;lt;</p></body>")
    assert r["text_extracted"] == "&lt;"


def test_title_and_head_are_chrome(spark):
    html = "<html><head><title>T &amp; U</title><meta x=1></head><body>B</body></html>"
    r = _extract(spark, html)
    assert r["title"] == "T & U"
    assert r["text_extracted"] == "B"


def test_link_count_and_lengths(spark):
    html = '<body><a href="/x">x</a><p>p</p><a href="/y">y</a></body>'
    r = _extract(spark, html)
    assert r["n_links"] == 2
    assert r["html_len"] == len(html)
    # anchor TEXT is prose (only nav/footer links are chrome)
    assert r["text_extracted"] == "x p y"


def test_entities_in_remaining_prose_decode(spark):
    r = _extract(spark, "<body>&quot;a&quot;&nbsp;&#39;b&#39;</body>")
    assert r["text_extracted"] == '"a" \'b\''


def test_catalog_roundtrip_is_all_true(spark):
    from fsql_spark.operators.html import q_html_extract

    rows = q_html_extract(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    assert all(r["roundtrip_ok"] for r in rows)
    assert all(r["n_links"] == 3 for r in rows)  # nav x2 + footer x1
    assert all(0 < r["text_ratio_bp"] < 10000 for r in rows)


def test_extract_links_one_row_per_href(spark):
    from fsql_spark.operators import extract_links

    df = spark.createDataFrame(
        [(1, '<a href="/x">x</a><p>n</p><a href="/doc/7">d</a>'), (2, "<p>none</p>")],
        "doc_id long, html string",
    )
    got = [(r["doc_id"], r["href"]) for r in extract_links(df, "html").collect()]
    assert sorted(got) == [(1, "/doc/7"), (1, "/x")]  # linkless rows drop out


def test_cross_links_are_deterministic_and_default_stays_byte_stable(spark):
    from fsql_spark.operators import extract_links
    from fsql_spark.operators.html import documents_as_html

    sf = "/root/testdata/sf0.001"
    plain = documents_as_html(spark, sf).orderBy("doc_id").limit(1).collect()[0]
    linked = documents_as_html(spark, sf, cross_links=True).orderBy("doc_id").limit(1).collect()[0]
    # cross_links only INSERTS the see-also paragraph; everything else stable
    assert linked["html"].replace(
        '<p>see also <a href="/doc/1">doc 1</a> and <a href="/doc/5">doc 5</a></p>', ""
    ) == plain["html"]
    # doc 0: targets (0*7+1)%500=1 and (0*13+5)%500=5, via real extraction
    hrefs = {
        r["href"]
        for r in extract_links(
            documents_as_html(spark, sf, cross_links=True).where("doc_id = 0"), "html"
        ).collect()
    }
    assert hrefs == {"/", "/about", "/terms", "/doc/1", "/doc/5"}


def test_anchor_extraction_zips_ids_with_texts(spark):
    from fsql_spark.operators.html import extract_doc_link_anchors

    df = spark.createDataFrame(
        [(9, '<a href="/doc/3">alpha</a><a href="/x">chrome</a><a href="/doc/12"></a>')],
        "doc_id long, html string",
    )
    got = {(r["target"], r["anchor"]) for r in extract_doc_link_anchors(df, "html").collect()}
    assert got == {(3, "alpha"), (12, "")}  # chrome link excluded; empty anchor kept


def test_anchor_aggregation_counts_sources(spark):
    from fsql_spark.operators.html import q_link_anchor_texts

    rows = {r["target_doc"]: r for r in
            q_link_anchor_texts(spark, "/root/testdata/sf0.001").collect()}
    # every doc receives exactly one *7+1 link and one *13+5 link (both
    # maps are bijections mod 500); anchor text is 'doc <target>'
    assert all(r["n_inlinks"] == 2 for r in rows.values())
    assert all(r["anchor_terms"] == f"doc {t}" for t, r in rows.items())
    assert all(r["n_sources"] in (1, 2) for r in rows.values())
