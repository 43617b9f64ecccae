"""Per-host politeness budget — salted two-phase top-k (SURVEY.md §2.A A5).

Reference analogue: tweetf0rm reads ``x-rate-limit-remaining`` /
``x-rate-limit-reset`` response headers and sleeps until the window
resets (``[U] tweetf0rm/twitterapi/twitter_api.py``) — i.e. at most N
calls per window per credential. Distributed restatement: at most
``max_per_wave`` fetches per registered_domain per wave; the rest stay
in the frontier as DEFERRED (BASELINE.json:L6).

Scale design — the skew problem (BASELINE.json:L14 "salted
repartitioning on registered-domain"): a naive
``Window.partitionBy('registered_domain')`` puts a hot domain's entire
frontier slice (millions of rows under Zipf skew) into ONE task. AQE
skew-join splitting does not apply to window partitions (SURVEY.md §4),
so we salt explicitly with an EXACT two-phase top-k:

  phase 1: window over (registered_domain, salt) where
           salt = pmod(url_hash, n_salts); keep rank ≤ budget.
           Any row in the true per-domain top-budget is necessarily in
           its salt bucket's top-budget ⇒ no correct row is lost.
           Hot-domain work now spreads over n_salts tasks and phase-1
           output is ≤ n_salts × budget rows per domain.
  phase 2: window over (registered_domain) on the tiny survivor set;
           rank ≤ budget decides. Semantics identical to the unsalted
           window, cost bounded regardless of skew.

Order within a domain is the engine total order
(priority desc, depth, url_hash) — deterministic, partition-layout-free.

Known cost, accepted: the survivor/loser branches both sit above the
phase-1 window, whose *exchange* is reused but whose sort+rank re-run
per branch (map-side only — no extra shuffle). Fusing the branches
would need either a conditional window (not expressible) or an extra
full-width exchange keyed by domain alone, which reintroduces the hot-
domain straggler this operator exists to kill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUDGET = 32
N_SALTS = 8

def _order(priority_col: str = "priority"):
    # built lazily — Column construction needs an active SparkContext.
    # ``priority_col`` lets the caller rank on a DERIVED effective
    # priority (e.g. base × host-health) without mutating the base
    # column that gets persisted back to the frontier (ADVICE r4).
    return (F.desc(priority_col), F.asc("depth"), F.asc("url_hash"))


def with_budget(
    candidates: DataFrame,
    politeness_budget: DataFrame | None,
    default_budget: int = DEFAULT_BUDGET,
) -> DataFrame:
    """Attach per-domain ``max_per_wave`` (broadcast; default for misses)."""
    if politeness_budget is None:
        return candidates.withColumn("max_per_wave", F.lit(default_budget))
    b = F.broadcast(
        politeness_budget.select("registered_domain", "max_per_wave")
    )
    return candidates.join(b, on="registered_domain", how="left").fillna(
        {"max_per_wave": default_budget}
    )


def politeness_rank(
    candidates: DataFrame,
    politeness_budget: DataFrame | None = None,
    n_salts: int = N_SALTS,
    default_budget: int = DEFAULT_BUDGET,
    priority_col: str = "priority",
) -> DataFrame:
    """candidates + ``host_rank`` (1-based position in the per-domain
    order) + ``within_budget`` boolean. Exact two-phase salted top-k."""
    df = with_budget(candidates, politeness_budget, default_budget)
    salt = F.pmod(F.col("url_hash"), F.lit(n_salts)).cast("int")
    df = df.withColumn("_salt", salt)

    w1 = Window.partitionBy("registered_domain", "_salt").orderBy(
        *_order(priority_col)
    )
    phase1 = df.withColumn("_r1", F.row_number().over(w1))
    survivors = phase1.filter(F.col("_r1") <= F.col("max_per_wave"))
    losers = phase1.filter(F.col("_r1") > F.col("max_per_wave"))

    w2 = Window.partitionBy("registered_domain").orderBy(*_order(priority_col))
    ranked = survivors.withColumn("host_rank", F.row_number().over(w2))

    kept_cols = [c for c in phase1.columns if not c.startswith("_r")]
    out = ranked.select(
        *kept_cols, "host_rank",
        (F.col("host_rank") <= F.col("max_per_wave")).alias("within_budget"),
    ).unionByName(
        # phase-1 losers can never be within budget; give them a rank
        # past the budget without a global renumber (exactness of the
        # *selection* is what golden traces pin, not loser ranks).
        losers.select(
            *kept_cols,
            F.lit(None).cast("int").alias("host_rank"),
            F.lit(False).alias("within_budget"),
        )
    )
    return out.drop("_salt")


def apply_politeness(
    candidates: DataFrame,
    politeness_budget: DataFrame | None = None,
    n_salts: int = N_SALTS,
    default_budget: int = DEFAULT_BUDGET,
    priority_col: str = "priority",
) -> DataFrame:
    """Split into fetchable rows vs DEFERRED via ``state`` column."""
    ranked = politeness_rank(
        candidates, politeness_budget, n_salts, default_budget, priority_col
    )
    return ranked.withColumn(
        "state",
        F.when(F.col("within_budget"), F.lit("QUEUED")).otherwise(
            F.lit("DEFERRED")
        ),
    )
