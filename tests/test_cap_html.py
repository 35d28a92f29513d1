"""Behavioral tests for the per-group frequency cap and HTML text
extraction (cross-engine value parity is covered by test_oracle_parity via
the registry; these pin the SEMANTICS)."""

from __future__ import annotations

import pandas as pd
import pytest

from chroma_spark.operators.sampling import cap_per_group, cap_per_group_sql
from chroma_spark.operators.textstats import html_to_text, html_to_text_sql


def _grouped(spark, n_parts):
    rows = [(i, "big" if i < 40 else ("mid" if i < 48 else "tiny")) for i in range(50)]
    return rows, spark.createDataFrame(rows, "id INT, source STRING").repartition(n_parts)


def test_cap_per_group_binds_and_is_deterministic(spark, duck):
    rows, df = _grouped(spark, 4)
    out = cap_per_group(df, cap=5, group_col="source").collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["source"], set()).add(r["id"])
    # hard cap binds on big groups, small groups pass through whole
    assert len(by_group["big"]) == 5
    assert len(by_group["mid"]) == 5
    assert len(by_group["tiny"]) == 2
    # survivor set is a function of (salt, id) only — stable under layout
    _, df2 = _grouped(spark, 13)
    out2 = cap_per_group(df2, cap=5, group_col="source").collect()
    assert {(r["id"], r["source"]) for r in out2} == {
        (r["id"], r["source"]) for r in out
    }
    # a different salt picks a different (but equally sized) survivor set
    out3 = cap_per_group(df, cap=5, group_col="source", salt="other").collect()
    assert len(out3) == len(out)
    assert {r["id"] for r in out3} != {r["id"] for r in out}
    # DuckDB twin agrees exactly
    duck.register("__capdocs", pd.DataFrame(rows, columns=["id", "source"]))
    ora = duck.execute(
        cap_per_group_sql("SELECT * FROM __capdocs", cap=5, group_col="source")
    ).fetchall()
    assert {(r[0], r[1]) for r in ora} == {(r["id"], r["source"]) for r in out}


def test_cap_per_group_plan_is_two_stage(spark):
    _, df = _grouped(spark, 4)
    plan = cap_per_group(df, cap=5, group_col="source")._jdf.queryExecution().executedPlan().toString()
    # stage 1 partitions by (group, input partition id): the skew-safe form
    assert plan.count("Window") >= 2
    assert "CartesianProduct" not in plan


def test_html_to_text_strips_and_decodes(spark, duck):
    rows = [
        (1, "<html><head><script>var x = '<p>';</script><style>b {x}</style>"
            "</head><body><h1>Title</h1><p>Hello <b>world</b></p></body></html>"),
        (2, "plain text, no markup"),
        (3, "a &lt;tag&gt; &amp;amp; &quot;quotes&quot; &amp; &nbsp;spaces"),
        (4, "<!-- multi\nline\ncomment -->visible<br/>text"),
        (5, None),
        (6, "<SCRIPT>upper().case;</SCRIPT>kept"),
    ]
    df = spark.createDataFrame(rows, "id INT, document STRING")
    out = {r["id"]: r for r in html_to_text(df).collect()}
    assert out[1]["clean_text"] == "Title Hello world"
    assert out[2]["clean_text"] == "plain text, no markup"
    # &amp;amp; decodes ONE level (to &amp;), like a single-pass decoder
    assert out[3]["clean_text"] == 'a <tag> &amp; "quotes" & spaces'
    assert out[4]["clean_text"] == "visible text"
    assert out[5]["clean_text"] == "" and out[5]["n_chars"] == 0
    assert out[6]["clean_text"] == "kept"  # (?i) case-insensitive script strip
    assert all(r["n_chars"] == len(r["clean_text"]) for r in out.values())
    # DuckDB twin agrees exactly (None document -> '' both sides)
    duck.register("__htmldocs", pd.DataFrame(rows, columns=["id", "document"]))
    ora = duck.execute(
        html_to_text_sql("SELECT * FROM __htmldocs") + " ORDER BY id"
    ).fetchall()
    for oid, text, nchars in ora:
        assert out[oid]["clean_text"] == text
        assert out[oid]["n_chars"] == nchars


def test_html_to_text_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "<p>x</p>")], "id INT, document STRING")
    plan = html_to_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection: runs at scan speed


def test_length_quantiles_exact_and_grouped(spark, duck):
    from chroma_spark.operators.textstats import length_quantiles, length_quantiles_sql

    rows = [
        (f"a{i}", "w " * i + "end", "ga") for i in range(1, 8)
    ] + [("b1", "one two three", "gb"), ("b2", None, "gb")]
    df = spark.createDataFrame(rows, "id STRING, document STRING, g STRING")
    out = {
        r["g"]: r
        for r in length_quantiles(
            df, probs=(0.5, 0.9), group_col="g", measure="tokens"
        ).collect()
    }
    # ga docs have 2..8 tokens -> exact interpolated median = 5
    assert out["ga"]["n_docs"] == 7 and out["ga"]["p50"] == 5.0
    # null document -> 0 tokens (coalesce to empty): gb = [3, 0] -> p50 = 1.5
    assert out["gb"]["n_docs"] == 2 and out["gb"]["p50"] == 1.5
    import pandas as pd

    duck.register("__lq", pd.DataFrame(rows, columns=["id", "document", "g"]))
    ora = duck.execute(
        length_quantiles_sql(
            "SELECT * FROM __lq", probs=(0.5, 0.9), group_col="g", measure="tokens"
        )
    ).fetchall()
    assert {(r[0], r[1], r[2], r[3]) for r in ora} == {
        (r["g"], r["n_docs"], r["p50"], r["p90"]) for r in out.values()
    }


# --- cross-engine property test: html_to_text on adversarial markup ---

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_FRAGMENTS = st.sampled_from(
    [
        "<p>", "</p>", "<P class='x'>", "<br/>", "<", ">", "&", ";",
        "<script>", "</script>", "<SCRIPT >", "</ SCRIPT>", "<style>",
        "</style>", "<!--", "-->", "&amp;", "&lt;", "&gt;", "&quot;",
        "&nbsp;", "&bogus;", "&amp;lt;", "word", "two words", "x=1<2",
        " ", "\t", "\n", "a&b", "<a href='#'>", "</a>", "<<>>", "<>",
    ]
)


@settings(max_examples=150, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(parts=st.lists(_FRAGMENTS, min_size=0, max_size=12))
def test_html_to_text_property_cross_engine(spark, duck, parts):
    """Java regex (Spark) and RE2 (DuckDB) must agree on EVERY markup shape
    the strip pipeline can see — unterminated tags, nested script, stray
    ampersands, double-encoded entities, whitespace runs."""
    from chroma_spark.operators.textstats import html_to_text, html_to_text_sql

    doc = "".join(parts)
    df = spark.createDataFrame([(1, doc)], "id INT, document STRING")
    got = html_to_text(df).collect()[0]
    exp = duck.execute(
        html_to_text_sql("SELECT 1 AS id, ? AS document", html_col="document"),
        [doc],
    ).fetchone()
    assert got["clean_text"] == exp[1], f"doc={doc!r}"
    assert got["n_chars"] == exp[2]


def test_corpus_report_semantics(spark):
    from chroma_spark.operators.textstats import corpus_report

    rows = [
        ("one two three", "ga"), ("four five", "ga"), ("", "ga"),
        ("a b c d e f", "gb"),
    ]
    df = spark.createDataFrame(rows, "document STRING, source STRING")
    got = {(r["source"], r["stat"]): r["value"] for r in corpus_report(df).collect()}
    assert got[("ga", "n_docs")] == 3.0
    assert got[("ga", "total_tokens")] == 5.0
    assert got[("ga", "p50_tokens")] == 2.0
    assert got[("ga", "empty_frac")] == pytest.approx(1 / 3, abs=1e-6)
    # 6 tokens -> 4 distinct 3-grams, far below k -> KMV is EXACT
    assert got[("gb", "distinct_3grams_est")] == 4.0
    assert got[("gb", "empty_frac")] == 0.0
    assert len(got) == 2 * 7  # 2 groups x 7 stats
