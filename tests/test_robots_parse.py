"""parse_robots_text / parse_robots (operators/robots.py): the pinned
robots.txt mini-grammar, plus end-to-end parse → verdict agreement."""

from pyspark.sql import functions as F

from tweetf0rm_spark.operators.robots import (
    parse_robots, parse_robots_text, robots_verdict,
)


def test_groups_comments_and_delay():
    rows = parse_robots_text(
        "h.example",
        "# top comment\n"
        "User-agent: *\n"
        "Disallow: /private  # trailing comment\n"
        "Crawl-delay: 2.5\n"
        "Allow: /\n"
        "\n"
        "User-agent: botA\n"
        "User-agent: botB\n"
        "Disallow: /x\n",
    )
    assert rows == [
        ("h.example", 0, "*", False, "/private", 2.5),
        ("h.example", 1, "*", True, "/", 2.5),
        ("h.example", 2, "botA", False, "/x", 0.0),
        ("h.example", 3, "botB", False, "/x", 0.0),
    ]


def test_empty_values_and_garbage_ignored():
    rows = parse_robots_text(
        "h.example",
        "Disallow: /orphan-before-any-group\n"   # no open group
        "User-agent: *\n"
        "Disallow:\n"                            # empty value: skip
        "Crawl-delay: soon\n"                    # unparsable: keep 0.0
        "nonsense line without colon\n"
        "Allow: /ok\n",
    )
    assert rows == [("h.example", 0, "*", True, "/ok", 0.0)]


def test_none_body_yields_nothing():
    assert parse_robots_text("h.example", None) == []


def test_parse_feeds_verdict(spark):
    bodies = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /no\nAllow: /\n"),
         ("b.example", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )
    rules = parse_robots(bodies)
    cand = spark.createDataFrame(
        [("https://a.example/no/1", "a.example"),
         ("https://a.example/yes", "a.example"),
         ("https://b.example/any", "b.example"),
         ("https://c.example/none", "c.example")],  # no rules: allow
        "url string, host string",
    )
    got = {
        r.url: r.robots_allowed
        for r in robots_verdict(cand, rules).collect()
    }
    assert got == {
        "https://a.example/no/1": False,
        "https://a.example/yes": True,
        "https://b.example/any": False,
        "https://c.example/none": True,
    }


# ---------------------------------------------------- property (hypothesis)

from hypothesis import given, settings
from hypothesis import strategies as st

_line = st.one_of(
    st.sampled_from(["User-agent: *", "User-agent: bot", "Allow: /a",
                     "Disallow: /b", "Disallow:", "Crawl-delay: 2",
                     "Crawl-delay: soon", "# comment", "", "garbage",
                     "Allow: /x  # tail"]),
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=30),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_line, max_size=30))
def test_parser_total_and_well_formed(lines):
    """parse_robots_text never raises on arbitrary ASCII input, and its
    output is always well-formed: rule_order is exactly 0..n-1, agents
    and prefixes are non-empty, allow is bool, delay is a float ≥ 0
    parsed from the group (or 0.0)."""
    rows = parse_robots_text("h.example", "\n".join(lines))
    assert [r[1] for r in rows] == list(range(len(rows)))
    for host, order, agent, allow, prefix, delay in rows:
        assert host == "h.example"
        assert agent and prefix
        assert isinstance(allow, bool)
        assert isinstance(delay, float) and delay >= 0.0


@settings(max_examples=100, deadline=None)
@given(st.lists(_line, max_size=30))
def test_parser_idempotent_on_its_own_echo(lines):
    """Re-serializing parsed rules to canonical lines and re-parsing
    yields the same rules (parse∘print∘parse = parse∘print) — the
    parser's grammar is self-consistent."""
    rows = parse_robots_text("h", "\n".join(lines))
    # canonical echo: open a new group whenever agent OR delay changes
    # (consecutive same-agent groups with different delays must not
    # merge, or the echo would smear the first group's delay)
    out, cur = [], None
    for _, _, agent, allow, prefix, delay in rows:
        if (agent, delay) != cur:
            out.append(f"User-agent: {agent}")
            cur = (agent, delay)
            if delay:
                out.append(f"Crawl-delay: {delay}")
        out.append(f"{'Allow' if allow else 'Disallow'}: {prefix}")
    rows2 = parse_robots_text("h", "\n".join(out))
    assert [r[2:] for r in rows2] == [r[2:] for r in rows]
