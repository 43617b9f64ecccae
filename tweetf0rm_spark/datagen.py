"""Deterministic synthetic crawl corpus (FIXTURES.md §A–B).

Every value is a pure function of ``(seed, i)`` via md5 mixing — no RNG
state, no wall clock — so any process regenerates byte-identical tables
(FIXTURES.md preamble). Two generation paths:

- :func:`gen_corpus` / :func:`write_corpus` — pandas+pyarrow, small
  scale (smoke/correctness tiers). Produces ``pages``, ``seeds``,
  ``outlinks``, ``robots_rules``, ``politeness_budget``.
- :func:`gen_frontier_df` — Spark-native (builtins only, fully
  distributed, no Python boundary) synthetic frontier for bench-tier
  runs: 10^7–10^8 rows locally, the same expressions scale to the
  10^10-row cluster target because generation is embarrassingly
  parallel over ``spark.range``.
"""

from __future__ import annotations

import hashlib
import math
import os
from dataclasses import dataclass

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import extract_text

SEED = 42
_EPOCH = pd.Timestamp("2026-01-01T00:00:00Z")

_SUBS = ["www", "blog", "shop", "news"]
_LANGS = ["en", "es", "de", "fr", "zh", "pt"]
_PATH_PREFIXES = ["/shop", "/private", "/tmp", "/admin"]
_LOREM = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua"
).split()


def h(*parts: object, seed: int = SEED) -> int:
    """Unsigned 64-bit deterministic mix (md5-based, FIXTURES.md preamble)."""
    key = ":".join([str(seed)] + [str(p) for p in parts])
    return int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "big")


def _zipf_cdf(n_domains: int, s: float = 1.2) -> list[float]:
    w = [1.0 / (j + 1) ** s for j in range(n_domains)]
    tot = sum(w)
    acc, cdf = 0.0, []
    for x in w:
        acc += x / tot
        cdf.append(acc)
    return cdf


def _domain_for(i: int, cdf: list[float]) -> int:
    u = (h("dom", i) % 10**9) / 10**9
    lo, hi = 0, len(cdf) - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if cdf[mid] < u:
            lo = mid + 1
        else:
            hi = mid
    return lo


def _dom_name(j: int) -> str:
    return f"site{j:04d}"


def _page_url(i: int, dom_j: int) -> str:
    sub = _SUBS[h("sub", i) % len(_SUBS)]
    p1 = format(h("p1", i) % 0xFFFF, "x")
    # trailing i-hex guarantees PK uniqueness at any tier
    p2 = format(h("p2", i) % 0xFFFFFF, "x") + format(i, "x")
    return f"https://{sub}.{_dom_name(dom_j)}.example/{p1}/{p2}"


def _decanonicalize(url: str, variant: int) -> str:
    """Produce a non-canonical variant of an existing url (FIXTURES A3)."""
    v = variant % 4
    if v == 0:  # uppercase host
        scheme, rest = url.split("://", 1)
        host, _, path = rest.partition("/")
        return f"{scheme}://{host.upper()}/{path}"
    if v == 1:  # explicit default port
        return url.replace(".example/", ".example:443/", 1)
    if v == 2:  # trailing fragment
        return url + "#frag"
    return url + "?b=2&a=1&utm_source=x"  # unsorted query + tracker


@dataclass
class Corpus:
    pages: pd.DataFrame
    seeds: pd.DataFrame
    outlinks: pd.DataFrame
    robots_rules: pd.DataFrame
    politeness_budget: pd.DataFrame


def gen_corpus(n_pages: int = 1000, n_domains: int = 20, n_seeds: int = 16) -> Corpus:
    """Generate the full deterministic corpus at a given tier."""
    cdf = _zipf_cdf(n_domains)
    dom_of = [_domain_for(i, cdf) for i in range(n_pages)]
    urls = [_page_url(i, dom_of[i]) for i in range(n_pages)]
    url_set = set(urls)
    # group page indices by domain for same-domain link targets
    by_dom: dict[int, list[int]] = {}
    for i, j in enumerate(dom_of):
        by_dom.setdefault(j, []).append(i)

    out_rows = []
    pages_rows = []
    for i in range(n_pages):
        k = h("k", i) % 21  # 0..20 links
        links: list[str] = []
        for p in range(k):
            r = h("ltype", i, p) % 100
            if r < 70:  # same registered domain
                cand = by_dom[dom_of[i]]
                dst = urls[cand[h("ldst", i, p) % len(cand)]]
            elif r < 95:  # cross-domain, Zipf target
                tgt_dom = _domain_for(h("xdom", i, p), cdf)
                cand = by_dom.get(tgt_dom) or by_dom[dom_of[i]]
                dst = urls[cand[h("ldst", i, p) % len(cand)]]
            elif r < 98:  # dead link — url not in pages
                dst = f"https://void.site9999.example/{format(h('dead', i, p) % 0xFFFFF, 'x')}"
            else:  # non-canonical variant of an existing url
                src = urls[h("vsrc", i, p) % n_pages]
                dst = _decanonicalize(src, h("var", i, p))
            anchor = _LOREM[h("anchor", i, p) % len(_LOREM)]
            links.append(dst)
            out_rows.append((urls[i], dst, anchor, p))

        n_par = 1 + h("npar", i) % 5
        paras = []
        for q in range(n_par):
            nw = 8 + h("nw", i, q) % 25
            words = [_LOREM[h("w", i, q, t) % len(_LOREM)] for t in range(nw)]
            paras.append("<p>" + " ".join(words) + "</p>")
        atags = "".join(
            f'<a href="{dst}">{_LOREM[h("anchor", i, p) % len(_LOREM)]}</a>'
            for p, dst in enumerate(links)
        )
        html = (
            f"<html><head><title>T{i}</title>"
            f"<script>var x={i};</script></head><body>"
            + "".join(paras)
            + atags
            + "</body></html>"
        )
        hb = html.encode("utf-8")
        pages_rows.append(
            (
                urls[i],
                _EPOCH + pd.Timedelta(seconds=h("ts", i) % (86400 * 90)),
                hb,
                extract_text(hb),
                _LANGS[h("lang", i) % len(_LANGS)],
            )
        )

    pages = pd.DataFrame(
        pages_rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )
    outlinks = pd.DataFrame(
        out_rows, columns=["src_url", "dst_url", "anchor", "link_pos"]
    )

    # seeds: first url of each of the first n_seeds distinct domains
    seen_dom, seed_rows = set(), []
    for i in range(n_pages):
        if dom_of[i] not in seen_dom:
            seen_dom.add(dom_of[i])
            seed_rows.append((urls[i], len(seed_rows)))
            if len(seed_rows) >= n_seeds:
                break
    seeds = pd.DataFrame(seed_rows, columns=["url", "seed_rank"])

    # robots: per host; ~10% of hosts disallow a prefix, 2% disallow all
    hosts = sorted({u.split("://", 1)[1].split("/", 1)[0] for u in urls})
    rob_rows = []
    for host in hosts:
        hv = h("rob", host) % 100
        delay = [0.0, 0.5, 1.0, 5.0][h("delay", host) % 4]
        order = 0
        if hv < 2:  # disallow all
            rob_rows.append((host, order, "*", False, "/", delay))
            order += 1
        elif hv < 12:  # disallow one prefix
            pfx = _PATH_PREFIXES[h("pfx", host) % len(_PATH_PREFIXES)]
            rob_rows.append((host, order, "*", False, pfx, delay))
            order += 1
        rob_rows.append((host, order, "*", True, "/", delay))
    robots_rules = pd.DataFrame(
        rob_rows,
        columns=["host", "rule_order", "agent", "allow", "path_prefix", "crawl_delay"],
    )

    # politeness: hot domains get smaller relative budgets (FIXTURES A5)
    pb_rows = []
    for j in range(n_domains):
        rd = f"{_dom_name(j)}.example"
        pb_rows.append((rd, max(1, 64 >> (j % 6))))
    pb_rows.append(("site9999.example", 1))  # dead-link domain
    politeness_budget = pd.DataFrame(
        pb_rows, columns=["registered_domain", "max_per_wave"]
    )
    return Corpus(pages, seeds, outlinks, robots_rules, politeness_budget)


_PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def write_corpus(out_dir: str, n_pages: int = 1000, n_domains: int = 20,
                 n_seeds: int = 16) -> Corpus:
    """Materialize the corpus as parquet files under ``out_dir``."""
    c = gen_corpus(n_pages, n_domains, n_seeds)
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(c.pages, schema=_PAGES_SCHEMA, preserve_index=False),
        os.path.join(out_dir, "pages.parquet"),
    )
    for name in ("seeds", "outlinks", "robots_rules", "politeness_budget"):
        pq.write_table(
            pa.Table.from_pandas(getattr(c, name), preserve_index=False),
            os.path.join(out_dir, f"{name}.parquet"),
        )
    return c


def gen_frontier_df(
    spark: SparkSession,
    n_rows: int,
    n_domains: int = 10_000,
    n_partitions: int | None = None,
    wave: int = 0,
) -> DataFrame:
    """Bench-tier synthetic frontier, generated JVM-side with builtins only.

    Zipf-ish hot-domain skew via an exponential rank transform of a
    hash-uniform draw (rank = floor(D^u) is log-uniform ⇒ ~1/rank mass),
    which reproduces the hot-domain imbalance the politeness window and
    the salted repartition must survive (BASELINE.json:L14). Scales
    linearly with partitions — the same job shape at 10^10 rows is just
    more ``spark.range`` splits.
    """
    n_partitions = n_partitions or spark.sparkContext.defaultParallelism * 2
    df = spark.range(0, n_rows, 1, n_partitions)
    u = (F.pmod(F.xxhash64(F.col("id"), F.lit(SEED)), F.lit(1_000_000)) / 1_000_000.0)
    dom_rank = F.floor(F.pow(F.lit(float(n_domains)), u)).cast("int")
    host = F.concat(F.lit("www.site"), F.lpad(dom_rank.cast("string"), 5, "0"), F.lit(".example"))
    url = F.concat(
        F.lit("https://"),
        host,
        F.lit("/p/"),
        F.lower(F.hex(F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(1 << 40)))),
    )
    return (
        df.select(
            url.alias("url"),
            host.alias("host"),
            F.concat(F.lit("site"), F.lpad(dom_rank.cast("string"), 5, "0"), F.lit(".example")).alias("registered_domain"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(7)), F.lit(100)).cast("int").alias("depth_raw"),
            (F.pmod(F.xxhash64(F.col("id"), F.lit(9)), F.lit(1_000_000)) / 1_000_000.0).alias("host_credit"),
            (F.pmod(F.xxhash64(F.col("id"), F.lit(11)), F.lit(365_000)) / 1000.0).alias("recrawl_age_days"),
        )
        .withColumn("url_hash", F.xxhash64(F.col("url")))
        .withColumn("depth", (F.col("depth_raw") % 8).cast("int"))
        .drop("depth_raw")
        .withColumn(
            "priority",
            F.col("host_credit") + F.exp(-F.col("depth")) + F.log1p(F.col("recrawl_age_days")) * 0.1,
        )
        .withColumn("discovered_ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")))
        .withColumn("state", F.lit("QUEUED"))
        .withColumn("wave", F.lit(wave).cast("int"))
    )
