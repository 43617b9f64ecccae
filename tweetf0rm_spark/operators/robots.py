"""robots.txt rule application (BASELINE.json:L6 "robots.txt rules
cached per-host").

No reference analogue — the Twitter REST API has no robots (SURVEY.md
§2.A note) — so semantics are pinned here, data-driven via the
``robots_rules`` table (host, rule_order, agent, allow, path_prefix,
crawl_delay):

  For a candidate (host, path): among rules with matching host, agent
  ``'*'``, and ``path startswith path_prefix``, the rule with the
  SMALLEST rule_order decides. No matching rule ⇒ allow.

Spark shape — **zero shuffle on the candidate side**: the rules table
is grouped per host into a rule array sorted by rule_order (tiny agg on
the small side only), broadcast, and evaluated with higher-order array
functions inside whole-stage codegen. This is the per-host robots
*cache* of the north star: one broadcast blob per host, reused by every
candidate row on every executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _rules_per_host(robots_rules: DataFrame) -> DataFrame:
    """(host, rules: array<struct<rule_order,allow,path_prefix,crawl_delay>>)
    with the array sorted by rule_order — first prefix match decides."""
    return (
        robots_rules.filter(F.col("agent") == "*")
        .groupBy(F.col("host").alias("_rhost"))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("rule_order", "allow", "path_prefix", "crawl_delay")
                )
            ).alias("_rules")
        )
    )


def robots_verdict(
    candidates: DataFrame,
    robots_rules: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """candidates + ``robots_allowed`` boolean + ``crawl_delay`` double.

    Broadcast join + array evaluation: no shuffle, no second join-back.
    """
    path = F.coalesce(
        F.nullif(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit("")),
        F.lit("/"),
    )
    out = candidates.join(
        F.broadcast(_rules_per_host(robots_rules)),
        candidates[host_col] == F.col("_rhost"),
        "left",
    ).withColumn(
        "_match",
        F.filter(
            F.col("_rules"), lambda r: path.startswith(r["path_prefix"])
        ),
    )
    first = F.element_at(F.col("_match"), 1)
    return (
        out.withColumn(
            "robots_allowed",
            F.when(F.size(F.col("_match")) > 0, first["allow"]).otherwise(
                F.lit(True)
            ),
        )
        .withColumn(
            "crawl_delay",
            F.when(F.size(F.col("_match")) > 0, first["crawl_delay"]).otherwise(
                F.lit(0.0)
            ),
        )
        .drop("_rhost", "_rules", "_match")
    )


# ---------------------------------------------------------------- parser

#: output of the robots.txt parser — exactly the robots_rules schema.
RULES_DDL = (
    "host string, rule_order int, agent string, allow boolean, "
    "path_prefix string, crawl_delay double"
)


def parse_robots_text(host: str, body: str | None) -> list[tuple]:
    """Parse one robots.txt body into rule rows (pinned mini-grammar).

    Grammar subset (deterministic, spec'd here — a real crawl would
    extend it, the *shape* is what the engine needs): lines of
    ``Key: value``; ``User-agent`` opens a group (consecutive
    user-agent lines share the following rules); ``Allow``/``Disallow``
    with a non-empty value append a rule to every open agent;
    ``Crawl-delay`` sets the group's delay, applied to ALL rules of the
    group regardless of position. ``#`` comments and blank/empty-value
    rule lines are ignored. ``rule_order`` is the 0-based emission
    index within the host's file (the verdict's first-match order).
    """
    if body is None:
        return []
    groups: list[dict] = []  # {'agents': [...], 'rules': [...], 'delay': f}
    cur: dict | None = None
    expecting_agents = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, val = line.split(":", 1)
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not val:
                continue
            if cur is None or not expecting_agents:
                cur = {"agents": [], "rules": [], "delay": 0.0}
                groups.append(cur)
                expecting_agents = True
            cur["agents"].append(val)
        elif cur is not None and key in ("allow", "disallow"):
            expecting_agents = False
            if val:
                cur["rules"].append((key == "allow", val))
        elif cur is not None and key == "crawl-delay":
            expecting_agents = False
            try:
                cur["delay"] = float(val)
            except ValueError:
                pass
    rows, order = [], 0
    for g in groups:
        for agent in g["agents"]:
            for allow, prefix in g["rules"]:
                rows.append((host, order, agent, allow, prefix, g["delay"]))
                order += 1
    return rows


def parse_robots(
    robots_bodies: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) → robots_rules rows via one Arrow crossing
    (mapInPandas, 1 file → N rules — the UDTF fan-out shape). Feeds
    :func:`robots_verdict` directly; no shuffle here, the downstream
    per-host cache agg is the only exchange."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            out = []
            for h, b in zip(pdf[host_col], pdf[body_col]):
                out.extend(parse_robots_text(h, b))
            yield pd.DataFrame(
                out,
                columns=[
                    "host", "rule_order", "agent", "allow",
                    "path_prefix", "crawl_delay",
                ],
            )

    return robots_bodies.select(
        F.col(host_col).alias(host_col), F.col(body_col).alias(body_col)
    ).mapInPandas(kernel, RULES_DDL)
