"""Canonicalizer spec + builtin-chain agreement (FIXTURES.md §C)."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tweetf0rm_spark.canon import canon_url, canon_url_col, canon_url_pandas

CASES = [
    # (raw, canonical)
    ("https://a.example/x", "https://a.example/x"),
    ("HTTPS://A.Example/x", "https://a.example/x"),
    ("https://a.example:443/x", "https://a.example/x"),
    ("http://a.example:80/x", "http://a.example/x"),
    ("http://a.example:8080/x", "http://a.example:8080/x"),
    ("https://a.example/x#frag", "https://a.example/x"),
    ("https://a.example//x///y", "https://a.example/x/y"),
    ("https://a.example/x/", "https://a.example/x"),
    ("https://a.example/", "https://a.example/"),
    ("https://a.example", "https://a.example/"),
    ("https://a.example/x?b=2&a=1", "https://a.example/x?a=1&b=2"),
    ("https://a.example/x?utm_source=s&a=1&fbclid=f", "https://a.example/x?a=1"),
    ("https://a.example/x?utm_source=s", "https://a.example/x"),
    ("https://a.example/%7Euser", "https://a.example/~user"),
    ("https://a.example/%2Fkeep", "https://a.example/%2Fkeep"),
    ("a.example/x", "https://a.example/x"),
    ("https://u:p@a.example/x", "https://u:p@a.example/x"),
]


@pytest.mark.parametrize("raw,want", CASES)
def test_spec_cases(raw, want):
    assert canon_url(raw) == want


@pytest.mark.parametrize("raw,_", CASES)
def test_idempotent_on_cases(raw, _):
    once = canon_url(raw)
    assert canon_url(once) == once


_url_paths = st.lists(
    st.text(alphabet="abcdefghij0123456789-._~", min_size=1, max_size=6),
    min_size=0,
    max_size=4,
)
_qkeys = st.lists(
    st.text(alphabet="abcdefghij", min_size=1, max_size=4), min_size=0, max_size=4
)


@settings(max_examples=200, deadline=None)
@given(
    host=st.text(alphabet="abcdefghijklmnop", min_size=1, max_size=8),
    path=_url_paths,
    qkeys=_qkeys,
    frag=st.booleans(),
    port=st.sampled_from(["", ":443", ":8080"]),
)
def test_idempotence_property(host, path, qkeys, frag, port):
    url = f"https://{host}.example{port}/" + "/".join(path)
    if qkeys:
        url += "?" + "&".join(f"{k}={i}" for i, k in enumerate(qkeys))
    if frag:
        url += "#f"
    once = canon_url(url)
    assert canon_url(once) == once


def test_pandas_wrapper_matches():
    s = pd.Series([c[0] for c in CASES] + [None])
    out = canon_url_pandas(s)
    assert list(out[:-1]) == [c[1] for c in CASES]
    assert out.iloc[-1] is None


def test_builtin_chain_agrees_with_spec(spark, corpus):
    """The JVM expression chain and the pure-Python spec must agree on
    every URL the corpus grammar can produce (pages + noisy outlinks)."""
    urls = pd.DataFrame(
        {"url": pd.concat([corpus.pages.url, corpus.outlinks.dst_url]).unique()}
    )
    got = (
        spark.createDataFrame(urls)
        .select("url", canon_url_col("url").alias("canon"))
        .toPandas()
    )
    want = got["url"].map(canon_url)
    mismatches = got[got["canon"] != want]
    assert mismatches.empty, mismatches.head()
