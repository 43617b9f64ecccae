"""Custom stateful streaming operator (SURVEY.md §2.B UDF/streaming
surface): per-domain LIFETIME fetch budget via ``applyInPandasWithState``.

The batch politeness operator enforces a *per-wave* budget; a polite
crawler also honours a *lifetime* cap per domain ("never take more than
B pages from this host, ever"). That cap is cumulative across
micro-batches, so it cannot be a per-batch window — it needs keyed
state that survives from one trigger to the next. This is the one
crawl operator where the state store genuinely beats snapshot tables:
the state is a single counter per domain (bounded, never snapshot-
diffed), while the seen-set stays in snapshot tables (SURVEY.md §2.B).

Scale shape: ``groupBy(registered_domain)`` shuffles each micro-batch
once; state is one long per domain (millions of domains → MBs per
executor, hash-partitioned). The per-group Python work is an Arrow
batch concat + head() — no per-row Python. Spark also ships the newer
``transformWithStateInPandas``; the per-group logic here is a single
counter, so the older single-function API is the clearer fit and keeps
the 4.x floor low.

Determinism: rows within one (micro-batch, domain) group are admitted
in (url_hash) order, so replays of a failed trigger admit the same
prefix. Cross-batch order is the arrival order of the batches, which
the checkpoint log pins.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: output rows = admitted fetches, tagged with the domain's running
#: lifetime position (1-based) and the pre-batch counter value.
OUT_DDL = (
    "url string, url_hash long, registered_domain string, "
    "n_before long, lifetime_rank long"
)
STATE_DDL = "n long"


def _admit(lifetime_budget: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (dom,) = key
        n = state.get[0] if state.exists else 0
        # concat the group's Arrow chunks so ordering is over the whole
        # (batch, domain) group, not chunk-local; per-domain-per-batch
        # row counts are politeness-bounded, so this stays small
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values("url_hash", kind="mergesort")
        take = max(0, lifetime_budget - n)
        kept = pdf.head(take)
        if len(kept):
            kept = kept.assign(
                registered_domain=dom,
                n_before=n,
                lifetime_rank=range(n + 1, n + 1 + len(kept)),
            )
            yield kept[
                ["url", "url_hash", "registered_domain",
                 "n_before", "lifetime_rank"]
            ]
        state.update((n + len(kept),))

    return fn


def lifetime_budget_stream(
    candidates: DataFrame, lifetime_budget: int = 100
) -> DataFrame:
    """Admit at most ``lifetime_budget`` urls per registered_domain
    over the WHOLE stream (all micro-batches), keyed state = one
    counter per domain. ``candidates`` must be a streaming DataFrame
    with at least (url, url_hash, registered_domain)."""
    return (
        candidates.select("url", "url_hash", "registered_domain")
        .groupBy("registered_domain")
        .applyInPandasWithState(
            _admit(lifetime_budget),
            OUT_DDL,
            STATE_DDL,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
