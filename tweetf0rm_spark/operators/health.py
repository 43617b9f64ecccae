"""Per-host fetch-health scoring — the engine analogue of the
reference's proxy-pool health management (SURVEY.md §2.A A11: the
reference checks its proxies and drops dead ones before crawling;
`[U] tweetf0rm/proxies.py` behavior class).

A distributed crawler has no proxy pool, but it has the same signal in
the failure ledger: hosts whose fetches keep failing (timeouts, 5xx —
here: null-html dead links) should not keep absorbing politeness
budget at full priority. The health score is a per-domain downweight
computed from the last K waves' attempt/failure counts and multiplied
into the priority before politeness ranking — a flapping host decays
toward ``floor`` and recovers automatically once fetches succeed
again (its failure rows age out of the K-wave window).

Spark shape: per-wave stats are one tiny groupBy over the fetch batch
and the failure set (both already politeness-bounded); the score table
is O(#domains) and enters the wave as a BROADCAST join — zero shuffle
on the candidate side, same pattern as the robots rule cache.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: never zero out a host entirely — a single bad wave must not
#: permanently starve it (it needs scheduled attempts to recover).
DEFAULT_FLOOR = 0.25


def health_stats(fetch_batch: DataFrame, failed: DataFrame) -> DataFrame:
    """One wave's (registered_domain, attempts, failures) counters.

    ``attempts`` = rows scheduled this wave; ``failures`` = rows whose
    fetch produced no page (wave.py `failed`). Full-outer so a domain
    that appears only in either side is still counted.
    """
    attempts = fetch_batch.groupBy("registered_domain").agg(
        F.count("*").alias("attempts")
    )
    fails = failed.groupBy("registered_domain").agg(
        F.count("*").alias("failures")
    )
    return (
        attempts.join(fails, "registered_domain", "full")
        .fillna({"attempts": 0, "failures": 0})
        .select(
            "registered_domain",
            F.col("attempts").cast("long").alias("attempts"),
            F.col("failures").cast("long").alias("failures"),
        )
    )


def host_health(
    stats_parts: list[DataFrame], floor: float = DEFAULT_FLOOR
) -> DataFrame:
    """Fold per-wave stats into (registered_domain, health).

    health = max(floor, 1 - Σfailures/Σattempts) over the supplied
    waves. Domains with zero attempts in the window score 1.0 (no
    evidence → no downweight). The output is O(#domains) — broadcast
    it into the wave (run_wave ``host_health=``).
    """
    allp = stats_parts[0]
    for p in stats_parts[1:]:
        allp = allp.unionByName(p)
    agg = allp.groupBy("registered_domain").agg(
        F.sum("attempts").alias("_a"), F.sum("failures").alias("_f")
    )
    rate = F.when(F.col("_a") > 0, F.col("_f") / F.col("_a")).otherwise(
        F.lit(0.0)
    )
    return agg.select(
        "registered_domain",
        F.greatest(F.lit(float(floor)), 1.0 - rate).alias("health"),
    )
