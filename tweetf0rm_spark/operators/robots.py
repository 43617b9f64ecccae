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
