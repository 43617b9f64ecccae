"""Public-suffix-aware registered_domain (VERDICT r1 item 9, r2 item 6).

``registered_domain_col`` (canon.py) takes the last two DNS labels —
correct for the synthetic ``*.example`` corpus, wrong for multi-label
public suffixes (``foo.co.uk`` → ``co.uk``). The real rule set is the
Mozilla Public Suffix List; at crawl scale it is a few-thousand-row
broadcast dim table, so the right Spark form is a handful of broadcast
equi-joins, all map-side, zero shuffle on the host side.

Full PSL matching semantics (publicsuffix.org/list — public
algorithm), including the two rule forms the r2 implementation
declared out of scope:

- normal rule ``co.uk``      — matches hosts ending in those labels;
- wildcard rule ``*.ck``     — ``*`` matches exactly one label;
- exception rule ``!www.ck`` — overrides a wildcard: the public suffix
  is the rule minus its leading label.

Prevailing rule: any matching exception wins (longest if several);
otherwise the longest matching normal/wildcard rule; otherwise the
implicit ``*`` rule (the bare TLD is the public suffix). Registered
domain = public suffix + one more label; a host that IS a public
suffix degrades to itself (engine keeps a non-null politeness key
rather than the spec's null).

Join form: for each suffix length k ≤ ``max_labels`` the host
contributes an exact candidate (its last-k labels) and a wildcard
candidate (``*.`` + last-(k−1) labels); each candidate key broadcast-
equi-joins the parsed rule table. Unknown TLDs fall back to
last-two-labels — identical to canon.py, so ``*.example`` crawls are
byte-identical with or without a PSL table (golden traces pin this).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Pinned mini-PSL for tests and offline runs (public knowledge —
# commonly-known entries of the Mozilla PSL, including its canonical
# wildcard/exception showcase, the .ck rules). A production deployment
# loads the full list into the same one-column table.
MINI_PSL = [
    "com", "org", "net", "edu", "gov", "io", "de", "fr", "jp", "uk",
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "co.in", "co.kr", "co.nz",
    "ck", "*.ck", "!www.ck",
]

#: longest rule (in labels) the join expansion covers; the mini list
#: needs 2, the full Mozilla list 5 (e.g. 4-label .jp city rules + a
#: wildcard label) — raising it adds broadcast joins, nothing else.
MAX_LABELS = 3


def mini_psl(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([(s,) for s in MINI_PSL], "suffix string")


def psl_rules(psl: DataFrame) -> DataFrame:
    """Parse raw PSL lines into (match_key, nlabels, is_exception).

    ``match_key`` keeps the ``*`` label verbatim (wildcard candidates
    are built in the same shape); the ``!`` marker is stripped into the
    flag. ``nlabels`` counts the labels of the key as written.
    """
    s = F.col("suffix")
    is_exc = s.startswith("!")
    body = F.when(is_exc, F.expr("substring(suffix, 2)")).otherwise(s)
    return psl.select(
        body.alias("match_key"),
        F.size(F.split(body, r"\.")).alias("nlabels"),
        is_exc.alias("is_exception"),
    )


def _last_k(labels: Column, k) -> Column:
    return F.concat_ws(".", F.slice(labels, -k, k))


def with_registered_domain(
    df: DataFrame,
    host: str = "host",
    out: str = "registered_domain",
    psl: DataFrame | None = None,
    max_labels: int = MAX_LABELS,
) -> DataFrame:
    """Attach ``out`` = PSL registered domain of ``df[host]``.

    psl=None → pure-expression last-two-labels (canon.py semantics,
    zero joins). With a psl table: full PSL matching (normal, wildcard,
    exception rules) via ``2·max_labels − 1`` broadcast joins.
    """
    labels = F.split(F.col(host), r"\.")
    n = F.size(labels)
    cand2 = F.when(n >= 2, _last_k(labels, 2)).otherwise(F.col(host))
    if psl is None:
        return df.withColumn(out, cand2)

    rules = psl_rules(psl)
    joined = df
    exc_hits: list[Column] = []
    norm_hits: list[Column] = []
    jid = 0

    def _join(cand: Column, k: int, exception: bool) -> None:
        nonlocal joined, jid
        key, flag = f"_psl_k{jid}", f"_psl_f{jid}"
        jid += 1
        side = F.broadcast(
            rules.filter(
                (F.col("nlabels") == k)
                & (F.col("is_exception") == F.lit(exception))
            ).select(
                F.col("match_key").alias(key),
                F.lit(True).alias(flag),
            )
        )
        joined = joined.join(
            side, F.when(n >= k, cand) == F.col(key), "left"
        ).drop(key)
        hit = F.when(F.col(flag), F.lit(k))
        (exc_hits if exception else norm_hits).append(hit)

    for k in range(1, max_labels + 1):
        _join(_last_k(labels, k), k, exception=False)          # normal
        if k >= 2:
            wild = F.concat_ws(
                ".", F.concat(F.array(F.lit("*")), F.slice(labels, -(k - 1), k - 1))
            )
            _join(wild, k, exception=False)                    # wildcard
            _join(_last_k(labels, k), k, exception=True)       # exception

    # NOTE: the hit columns reference _psl_f* flags, so evaluate the
    # verdict BEFORE dropping them.
    # exception/wildcard joins only run for k >= 2, so exc_hits is
    # empty when max_labels == 1 (ADVICE r3: greatest() with zero args
    # crashed); no exception rule can match → null verdict.
    if not exc_hits:
        exc_k = F.lit(None).cast("int")
    elif len(exc_hits) == 1:
        exc_k = exc_hits[0]
    else:
        exc_k = F.greatest(*exc_hits)
    norm_k = F.coalesce(
        norm_hits[0] if len(norm_hits) == 1 else F.greatest(*norm_hits),
        F.lit(1),  # implicit '*' rule: unknown TLD is a public suffix
    )
    rd = (
        # exception rule: public suffix = rule minus leading label, so
        # the registered domain is the rule-matched span itself
        F.when(exc_k.isNotNull(), _last_k(labels, exc_k))
        .when(n > norm_k, _last_k(labels, norm_k + F.lit(1)))
        .otherwise(F.col(host))  # host IS a public suffix → degrade
    )
    joined = joined.withColumn(out, rd)
    return joined.drop(*[c for c in joined.columns if c.startswith("_psl_f")])
