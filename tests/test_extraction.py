"""Extraction golden tests: byte-identical text per url (BASELINE
input_hint), mirroring the reference's event-fixture golden tests
(test/genegraph/annotate_test.clj:13-87)."""

from __future__ import annotations

from pyspark.sql import functions as F

from genegraph_spark import fixtures
from genegraph_spark.functions.text import extract_text, extract_text_py, is_tombstone


def test_extract_text_py_units():
    assert extract_text_py(b"<html><body><p>hello world</p></body></html>") == "hello world"
    # entities, incl. double-encoded &amp;lt;
    assert (
        extract_text_py(b"<html><body>a &amp; b &lt;c&gt; &quot;d&quot; &amp;lt;</body></html>")
        == 'a & b <c> "d" &lt;'
    )
    # script/style with tag-like content removed before tag stripping
    assert (
        extract_text_py(
            b'<html><body><script>var s="<div>";</script><style>.x>y{}</style>ok</body></html>'
        )
        == "ok"
    )
    # comments, whitespace collapse, utf-8 multibyte
    assert extract_text_py("<body> a\n\t b <!-- <p>no</p> --> café </body>".encode()) == "a b café"
    # malformed → None (quarantine path)
    assert extract_text_py(b"\xff\xfe broken") is None
    assert extract_text_py(b"no body tag") is None
    assert extract_text_py(None) is None


def test_extraction_byte_identical_per_url(spark, sf_dir):
    pages = fixtures.pages_df(spark, sf_dir)
    got = pages.withColumn("extracted", extract_text("html"))
    bad = got.where(
        F.col("extracted").isNull() | (F.col("extracted") != F.col("text"))
    ).count()
    assert bad == 0
    assert got.count() > 500  # v1 + v2 + v3 rows


def test_tombstone_detection(spark, sf_dir):
    pages = fixtures.pages_df(spark, sf_dir)
    got = pages.withColumn("detected", is_tombstone("html"))
    mism = got.where(F.col("detected") != F.col("tombstone")).count()
    assert mism == 0
    assert got.where("detected").count() == got.where("version = 3").count() > 0
