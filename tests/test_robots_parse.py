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
