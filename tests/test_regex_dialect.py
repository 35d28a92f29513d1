"""Regex dialect parser (ChromaRegex/HIR analog, rust/types/src/regex/):
validation by parsing (not token blacklists), required-literal extraction,
and the contains-prefilter equivalence on the real $regex path."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from chroma_spark.regex_dialect import (
    RegexDialectError,
    parse,
    prefilter_literals,
    required_literals,
)
from chroma_spark.where import WhereError, validate_regex

ACCEPTED = [
    "spark",
    "a.c",
    "colou?r",
    "(data|query) engine",
    "[a-z]+[0-9]{2,4}",
    "^start.*end$",
    r"\bword\b",
    r"foo\.bar\(\)",
    "(?:non)?capturing",
    "(?i)CaSe",
    "(?is)flags.anywhere",
    "[]]",  # leading ] is a literal member
    "[(?=]",  # the round-2 blacklist false positive: literal class chars
    "[[\\]]",
    r"\d{3}-\d{4}",
    "a|b|c",
    "x{3}",
    "x{2,}?",
    "nested(group(inner)+)*",
    "\\x41bc",
    "tab\\there",
    "[\\x41-\\x5a]",
]

REJECTED = [
    "(?=lookahead)",
    "(?!negative)",
    "(?<=lookbehind)x",
    "(?<!neg)x",
    "(?<name>x)",
    "(?P<name>x)",
    r"(a)\1",  # backreference
    r"\k<name>",
    "(?>atomic)",
    "a*+",  # possessive
    "a(b",  # unclosed group
    "a)b",  # unbalanced close
    "[abc",  # unclosed class
    "*dangling",
    "x{4,2}",  # inverted range
    r"\Zend",
    "[[:alpha:]]",  # POSIX names differ across engines
    r"\p{L}+",  # absent from Python re (the DELETE_WHERE twin)
    "(?U)x",  # Unicode-case in Java, ungreedy in RE2
    "[a&&b]",  # class intersection in Java, literal '&'s in RE2/Python
    "\\u0041bc",  # \uXXXX absent from RE2
    "[\\u0041]",  # same, inside a class
    "a\\vb",  # \v: single char in RE2/Python, whitespace CLASS in Java 8+
    "price{",  # stray '{': literal in RE2/Python, Java 'Illegal repetition'
    "a{,3}",  # not a valid quantifier anywhere; Java rejects outright
    "",
]


@pytest.mark.parametrize("pattern", ACCEPTED)
def test_dialect_accepts(pattern):
    parse(pattern)  # no raise
    validate_regex(pattern)
    re.compile(pattern)  # python (the third twin) agrees it's a valid regex


@pytest.mark.parametrize("pattern", REJECTED)
def test_dialect_rejects(pattern):
    with pytest.raises(RegexDialectError):
        parse(pattern)
    with pytest.raises(WhereError):
        validate_regex(pattern)


def test_required_literals_extraction():
    assert required_literals(parse("spark")) == ["spark"]
    assert required_literals(parse("big(data|query)engine")) == ["big", "engine"]
    assert required_literals(parse("foo.*barbaz")) == ["foo", "barbaz"]
    # quantifier binds the LAST char only: "colou?r" requires "colo"
    assert required_literals(parse("colou?r")) == ["colo"]
    # min>=1 repetition keeps its sub's requirement; min=0 drops it
    assert required_literals(parse("(abcd)+xyz")) == ["abcd", "xyz"]
    assert required_literals(parse("(abcd)*xyz")) == ["xyz"]
    # alternation contributes nothing (branches differ)
    assert required_literals(parse("aaa|bbb")) == []
    # short runs are dropped (trigram bar)
    assert required_literals(parse("ab.cd")) == []
    # escaped metachars count as literal text
    assert required_literals(parse(r"foo\.bar")) == ["foo.bar"]


def test_prefilter_literals_case_flag_unsound():
    assert prefilter_literals("spark") == ["spark"]
    assert prefilter_literals("(?i)spark") == []  # case-folding breaks contains
    assert prefilter_literals("(?s)spark") == ["spark"]  # dotall does not


_LIT = st.text(st.sampled_from("abc xyz"), min_size=0, max_size=6)


@settings(max_examples=200, deadline=None)
@given(
    lit=_LIT,
    pattern=st.sampled_from(
        ["spark.*engine", "colou?r", "(abcd)+xyz", r"data\s+model", "big(data|query)engine"]
    ),
    doc=st.text(st.sampled_from("sparkengine colou?r abcdxyz data model bigquery "), max_size=40),
)
def test_prefilter_never_changes_matches(lit, pattern, doc):
    """contains(required literal) is implied by re.search(pattern): the
    guard may never reject a matching document."""
    if re.search(pattern, doc):
        for req in prefilter_literals(pattern, min_len=1):
            assert req in doc, (pattern, req, doc)


def test_regex_column_prefilter_matches_plain_rlike(spark):
    from chroma_spark.registry import load
    from chroma_spark.where import where_doc_to_column
    from tests.conftest import SF_SMALL

    docs = load(spark, SF_SMALL, "documents").select(F_col_text())
    pattern = "merge.*(table|stream)"
    guarded = docs.filter(where_doc_to_column({"$regex": pattern})).collect()
    plain = docs.filter(F_coalesce_rlike(pattern)).collect()
    assert sorted(r.document for r in guarded) == sorted(r.document for r in plain)
    assert len(guarded) > 0


def F_col_text():
    from pyspark.sql import functions as F

    return F.col("text").alias("document")


def F_coalesce_rlike(pattern):
    from pyspark.sql import functions as F

    return F.coalesce(F.col("document"), F.lit("")).rlike(pattern)
