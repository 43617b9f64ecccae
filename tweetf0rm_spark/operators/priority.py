"""Frontier priority scoring (SURVEY.md §1.2 / §2.B math row).

Mirrors the reference's crawl ordering: tweetf0rm's FIFO redis queues +
uniform fan-out yield breadth-first order over the follower graph
(``[U] tweetf0rm/handler/crawl_user_relationship_command_handler.py``;
BASELINE.json:L6 "follower-network BFS ordering"). Here BFS shows up as
the ``exp(-depth)`` term dominating, with host-credit and recrawl-age as
the crawl-scheduling refinements tweetf0rm lacked.

Pinned formula (golden-trace-bearing — changing weights is a
golden-breaking event):

    priority = W_CREDIT * host_credit
             + W_DEPTH  * exp(-depth)
             + W_AGE    * log1p(recrawl_age_days)

All built-ins — stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

W_CREDIT = 1.0
W_DEPTH = 1.0
W_AGE = 0.1

#: total order used everywhere ordering is scored — ties broken by
#: url_hash, never by partition id (determinism, SURVEY.md §4).
ORDER_COLS = ("priority", "depth", "url_hash")


def priority_col(
    host_credit: Column | float = 1.0,
    depth: Column | int = 0,
    recrawl_age_days: Column | float = 0.0,
) -> Column:
    hc = host_credit if isinstance(host_credit, Column) else F.lit(float(host_credit))
    d = depth if isinstance(depth, Column) else F.lit(int(depth))
    age = (
        recrawl_age_days
        if isinstance(recrawl_age_days, Column)
        else F.lit(float(recrawl_age_days))
    )
    return (
        F.lit(W_CREDIT) * hc
        + F.lit(W_DEPTH) * F.exp(-d.cast("double"))
        + F.lit(W_AGE) * F.log1p(age)
    )


def order_by_priority(df, desc_priority: bool = True):
    """Apply the engine's total order: (priority desc, depth, url_hash)."""
    return df.orderBy(
        F.desc("priority") if desc_priority else F.asc("priority"),
        F.asc("depth"),
        F.asc("url_hash"),
    )
