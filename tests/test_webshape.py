"""Page-shape operators: layout-template detection and crawl-trap URL
flags — semantics unit tests (oracle parity rides tests/test_crawl.py's
NEW_QUERIES sweep and the strict harness)."""

import sys

sys.path.insert(0, ".")


def test_template_key_ignores_text(spark):
    from pdf_extraction_spark.operators.webshape import template_pages

    rows = [
        (1, "<html><body><p>alpha</p></body></html>"),
        (2, "<html><body><p>completely different words</p></body></html>"),
        (3, "<html><body><div>alpha</div></body></html>"),  # other layout
        (4, None),
        (5, "no tags at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    out = {r["doc_id"]: r for r in template_pages(df, min_count=2).collect()}
    # same tag sequence, different text → same key, counted together
    assert out[1]["layout_key"] == out[2]["layout_key"]
    assert out[1]["n_same_layout"] == 2 and out[1]["is_template"]
    assert out[3]["layout_key"] != out[1]["layout_key"]
    assert not out[3]["is_template"]
    # NULL html and tag-less html share the empty-sequence key
    assert out[4]["layout_key"] == out[5]["layout_key"]
    assert out[4]["n_tags"] == 0


def test_template_counts_case_and_close_tags(spark):
    from pdf_extraction_spark.operators.webshape import template_pages

    df = spark.createDataFrame(
        [(1, "<DIV><P></P></DIV>"), (2, "<div><p></p></div>")],
        "doc_id long, html string",
    )
    out = template_pages(df, min_count=2).collect()
    assert all(r["is_template"] for r in out)
    assert all(r["n_tags"] == 4 for r in out)  # close tags count


def test_url_trap_flags_shapes(spark):
    from pdf_extraction_spark.operators.webshape import url_trap_flags

    rows = [
        ("https://h/a/b/c/d/e/f/g/h/i/x",),     # depth 10
        ("https://h/p;JSESSIONID=AB12",),        # path session id
        ("https://h/p?x=1&PHPSESSID=z",),        # query session id
        ("https://h/2023/11/events/item",),      # calendar at depth 4
        ("https://h/2023/11",),                  # calendar but depth 2 → ok
        ("https://h/cat/item/cat/other",),       # repeated segment
        ("https://h/p?a=1&b=2&c=3",),            # params only → ok
        ("https://h",),                          # no path
        (None,),
    ]
    df = spark.createDataFrame(rows, "url string")
    out = {r["url"]: r for r in url_trap_flags(df).collect()}
    assert out["https://h/a/b/c/d/e/f/g/h/i/x"]["is_trap"]
    assert out["https://h/p;JSESSIONID=AB12"]["has_session_id"]
    assert out["https://h/p?x=1&PHPSESSID=z"]["has_session_id"]
    assert out["https://h/2023/11/events/item"]["deep_calendar"]
    assert not out["https://h/2023/11"]["is_trap"]
    assert out["https://h/cat/item/cat/other"]["repeated_segment"]
    trap_free = out["https://h/p?a=1&b=2&c=3"]
    assert trap_free["n_params"] == 3 and not trap_free["is_trap"]
    assert out["https://h"]["path_depth"] == 0
    assert not out[None]["is_trap"]
