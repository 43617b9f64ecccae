"""Golden-trace regression gate (BASELINE.json:L6 "verified by
`python -m pytest -x -q` against recorded golden traces").

Re-runs the full crawl on the golden corpus and compares wave-by-wave
fetch ordering, the final URL-seen set, per-url md5(text), and lineage
counters against the committed fixtures in tests/golden/.
"""

import hashlib
import json
import os

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


@pytest.fixture(scope="module")
def crawl_run(spark):
    from tools.record_golden import collect_traces, run_crawl

    cr = run_crawl(spark)
    return collect_traces(spark, cr)


def _golden(name):
    path = os.path.join(GOLDEN_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"golden fixture {name} not recorded yet")
    with open(path) as f:
        return f.read()


def test_crawl_ordering_matches_golden(crawl_run):
    waves, _, _, _ = crawl_run
    want = [json.loads(line) for line in
            _golden("trace_waves.jsonl").splitlines()]
    assert len(waves) == len(want)
    for got_w, want_w in zip(waves, want):
        assert got_w["wave"] == want_w["wave"]
        assert got_w["urls"] == want_w["urls"], f"wave {got_w['wave']} order diff"


def test_seen_set_matches_golden(crawl_run):
    _, seen, _, _ = crawl_run
    want = _golden("seen_final.txt").splitlines()
    assert seen == want


def test_text_md5_byte_identity(crawl_run):
    _, _, md5s, _ = crawl_run
    want = dict(
        line.split("\t") for line in _golden("text_md5.tsv").splitlines()
    )
    assert md5s == want


def test_lineage_matches_golden(crawl_run):
    _, _, _, lineage = crawl_run
    want = [json.loads(line) for line in _golden("lineage.jsonl").splitlines()]
    assert lineage == want


def test_extractor_spec_is_frozen():
    """Canary: the extractor output for a pinned input must never
    change without re-recording goldens."""
    from tweetf0rm_spark.extract import extract_text

    html = (
        b"<html><head><title>Frozen</title><script>no</script></head>"
        b"<body><p>a  b</p><div>c<b>d</b></div><li>e</li><br>f</body></html>"
    )
    out = extract_text(html)
    assert (
        hashlib.md5(out.encode()).hexdigest() == "e546a9fde4a14d47c6f1fb1a7892415e"
    ), out
