"""HTML→text extraction: boilerplate stripping, block/inline layout,
entities, quarantine, totality."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as hst

from django_datastream_spark.functions.html import (
    extract_html_text,
    html_to_text,
)


def test_html_basic_extraction():
    page = """<html><head><title> The  Title </title>
    <style>body { color: red }</style></head>
    <body><h1>Head</h1><p>para one</p><p>para
    two</p><script>var x = "no leak";</script>
    <div>tail <b>bold</b> text</div>
    <a href="/a">link text</a><a href="/b"></a></body></html>"""
    r = html_to_text(page)
    assert r["title"] == "The Title"
    assert r["text"].split("\n") == [
        "Head", "para one", "para two", "tail bold text", "link text",
    ]
    assert r["links"] == ["/a", "/b"]
    assert 0 < r["text_ratio"] < 1


def test_html_entities_and_nested_skip():
    r = html_to_text(
        "<p>a &amp; b &lt;c&gt; &#169;</p>"
        "<noscript><p>hidden</p><script>x</script></noscript><p>end</p>"
    )
    assert r["text"] == "a & b <c> ©\nend"


def test_html_tag_soup_is_tolerated():
    # unclosed tags, stray brackets, attributes without quotes
    r = html_to_text("<p>one<p>two<div class=x>three</p><b>four")
    assert r["text"].split("\n") == ["one", "two", "three", "four"]


@settings(max_examples=40, deadline=None)
@given(data=hst.text(max_size=400))
def test_html_total_on_arbitrary_text(data):
    r = html_to_text(data)
    assert isinstance(r["text"], str)


def test_extract_html_text_spark_stage(spark):
    rows = [
        (0, "<html><title>t0</title><p>hello world</p></html>"),
        (1, "<p>solo</p><a href='x'>y</a>"),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r["doc_id"]: r for r in extract_html_text(df).collect()}
    assert got[0]["title"] == "t0" and got[0]["text"] == "hello world"
    assert got[1]["n_links"] == 1 and got[1]["text"] == "solo\ny"
    assert got[2]["parse_err"] == "null html"


def test_extract_html_text_string_doc_id_passes_through_typed(spark):
    df = spark.createDataFrame(
        [("doc-a", "<p>hi</p>")], "doc_id string, html string"
    )
    out = extract_html_text(df)
    assert out.schema["doc_id"].dataType.simpleString() == "string"
    row = out.collect()[0]
    assert row["doc_id"] == "doc-a" and row["text"] == "hi"
