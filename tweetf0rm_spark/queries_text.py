"""Training-data-pipeline operators over ``documents``/``embeddings``
(the driver's first-class extension set: dedup family, similarity
search, text analysis) — each oracle-checked against DuckDB.

Cross-engine determinism notes:
- all text here is ASCII (synthetic corpus), so ``lower`` / regex
  behave identically in Java regex and RE2;
- minhash uses ``min(md5(salt || token))`` over *string* order — md5
  hex compares identically everywhere, sidestepping the lack of a
  shared 64-bit integer hash between Spark and DuckDB;
- simhash bits come from md5 hex-digit parity (integer arithmetic,
  exact);
- cosine similarity: float32 → double casts are exact, products/sums
  run in the same left-to-right order, sqrt is IEEE-correctly-rounded;
  outputs rounded to 6 dp to absorb any engine-divergent ulp.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .queries import Q, t

TEXT: dict[str, Q] = {}


def q(name: str, oracle: str | None):
    def deco(fn):
        TEXT[name] = Q(fn, oracle)
        return fn
    return deco


# ------------------------------------------------------------- text stats

@q(
    "text_token_count",
    """SELECT doc_id,
              len(string_split(text, ' ')) AS n_tokens,
              len(list_distinct(string_split(text, ' '))) AS n_distinct,
              length(text) AS n_chars
       FROM documents""",
)
def text_token_count(spark, sf):
    d = t(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length("text").alias("n_chars"),
    )


@q(
    "text_stats_by_lang",
    """SELECT lang, count(*) AS n_docs,
              CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
              CAST(sum(length(text)) AS BIGINT) AS total_chars
       FROM documents GROUP BY lang""",
)
def text_stats_by_lang(spark, sf):
    d = t(spark, sf, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("total_tokens"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
    )


@q(
    "text_fingerprint",
    """SELECT doc_id,
              md5(lower(text)) AS fp_exact,
              md5(array_to_string(list_sort(list_distinct(
                    string_split(lower(text), ' '))), ' ')) AS fp_tokenset
       FROM documents""",
)
def text_fingerprint(spark, sf):
    d = t(spark, sf, "documents")
    toks = F.array_distinct(F.split(F.lower(F.col("text")), " "))
    return d.select(
        "doc_id",
        F.md5(F.lower("text")).alias("fp_exact"),
        F.md5(F.array_join(F.sort_array(toks), " ")).alias("fp_tokenset"),
    )


@q(
    "text_langid_heuristic",
    """SELECT doc_id,
              len(list_intersect(string_split(lower(text), ' '),
                  ['the', 'a', 'of', 'and', 'to'])) AS en_hits,
              len(list_intersect(string_split(lower(text), ' '),
                  ['el', 'la', 'de', 'los', 'y'])) AS es_hits,
              CASE WHEN len(list_intersect(string_split(lower(text), ' '),
                       ['the', 'a', 'of', 'and', 'to']))
                     >= len(list_intersect(string_split(lower(text), ' '),
                       ['el', 'la', 'de', 'los', 'y']))
                    AND len(list_intersect(string_split(lower(text), ' '),
                       ['the', 'a', 'of', 'and', 'to'])) > 0
                   THEN 'en'
                   WHEN len(list_intersect(string_split(lower(text), ' '),
                       ['el', 'la', 'de', 'los', 'y'])) > 0
                   THEN 'es'
                   ELSE 'und' END AS pred_lang
       FROM documents""",
)
def text_langid_heuristic(spark, sf):
    d = t(spark, sf, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    en = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in
        ["the", "a", "of", "and", "to"]])))
    es = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in
        ["el", "la", "de", "los", "y"]])))
    return d.select(
        "doc_id",
        en.alias("en_hits"),
        es.alias("es_hits"),
        F.when((en >= es) & (en > 0), "en")
        .when(es > 0, "es")
        .otherwise("und")
        .alias("pred_lang"),
    )


@q(
    "text_quality_score",
    """SELECT doc_id,
              len(string_split(text, ' ')) AS n_tokens,
              round(len(list_distinct(string_split(text, ' '))) * 1.0
                    / len(string_split(text, ' ')), 6) AS diversity,
              round(0.5 * (len(list_distinct(string_split(text, ' '))) * 1.0
                           / len(string_split(text, ' ')))
                  + 0.5 * least(1.0, len(string_split(text, ' ')) / 100.0), 6)
                AS quality
       FROM documents""",
)
def text_quality_score(spark, sf):
    d = t(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    nt = F.size(toks)
    diversity = F.size(F.array_distinct(toks)) * F.lit(1.0) / nt
    return d.select(
        "doc_id",
        nt.alias("n_tokens"),
        F.round(diversity, 6).alias("diversity"),
        F.round(
            0.5 * diversity + 0.5 * F.least(F.lit(1.0), nt / F.lit(100.0)), 6
        ).alias("quality"),
    )


# ------------------------------------------------------------ dedup family

@q(
    "dedup_exact_groups",
    """WITH fp AS (
         SELECT doc_id,
                md5(array_to_string(list_sort(list_distinct(
                      string_split(lower(text), ' '))), ' ')) AS fp_tokenset
         FROM documents)
       SELECT fp_tokenset, count(*) AS n_docs, min(doc_id) AS keeper
       FROM fp GROUP BY fp_tokenset HAVING count(*) > 1""",
)
def dedup_exact_groups(spark, sf):
    d = t(spark, sf, "documents")
    fp = F.md5(
        F.array_join(
            F.sort_array(F.array_distinct(F.split(F.lower(F.col("text")), " "))),
            " ",
        )
    )
    return (
        d.select("doc_id", fp.alias("fp_tokenset"))
        .groupBy("fp_tokenset")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_docs") > 1)
    )


_MINHASH_K = 8


def _minhash_sql() -> str:
    mins = ",\n                ".join(
        f"min(substr(h{i // 4}, {1 + 8 * (i % 4)}, 8)) AS m{i}"
        for i in range(_MINHASH_K)
    )
    return f"""WITH tok AS (
         SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS w
         FROM documents),
       hs AS (SELECT doc_id, md5('k0:' || w) AS h0, md5('k1:' || w) AS h1
              FROM tok),
       mh AS (SELECT doc_id, {mins}
              FROM hs GROUP BY doc_id),
       bands AS (
         SELECT doc_id, 1 AS band_no, m0 || m1 || m2 || m3 AS sig FROM mh
         UNION ALL
         SELECT doc_id, 2 AS band_no, m4 || m5 || m6 || m7 AS sig FROM mh)
       SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       FROM bands a JOIN bands b
         ON a.band_no = b.band_no AND a.sig = b.sig AND a.doc_id < b.doc_id"""


@q("dedup_minhash_lsh", _minhash_sql())
def dedup_minhash_lsh(spark, sf):
    """MinHash (k=8) + LSH banding (2 bands of 4): candidate near-dup
    pairs = docs sharing any band signature. Shuffle profile at scale:
    one explode + one groupBy(doc_id) agg + one equi-join on
    (band_no, sig) — no O(n²) comparison.

    Hash economics: the k=8 functions are the 4 disjoint 8-hex-char
    windows of TWO salted md5 digests (md5 bits are uniformly mixed, so
    disjoint 32-bit slices act as independent hash functions — the
    standard few-digests-many-hashes trick), computed in a projection
    BELOW the agg so each token row pays exactly 2 md5 calls instead of
    8 — a 4× cut of the per-token hash CPU that dominates at corpus
    scale (at sf0.1 the wall is instead candidate-pair materialization:
    the synthetic docs are highly self-similar). Lexicographic min over
    fixed-width hex == numeric min over the 32-bit slice."""
    d = t(spark, sf, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.lower(F.col("text")), " "))).alias("w"),
    )
    hs = tok.select(
        "doc_id",
        F.md5(F.concat(F.lit("k0:"), F.col("w"))).alias("h0"),
        F.md5(F.concat(F.lit("k1:"), F.col("w"))).alias("h1"),
    )
    mh = hs.groupBy("doc_id").agg(
        *[
            F.min(F.substring(f"h{i // 4}", 1 + 8 * (i % 4), 8)).alias(f"m{i}")
            for i in range(_MINHASH_K)
        ]
    )
    b1 = mh.select(
        "doc_id",
        F.lit(1).alias("band_no"),
        F.concat("m0", "m1", "m2", "m3").alias("sig"),
    )
    b2 = mh.select(
        "doc_id",
        F.lit(2).alias("band_no"),
        F.concat("m4", "m5", "m6", "m7").alias("sig"),
    )
    bands = b1.unionByName(b2)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


_JACC_K = 8          # minhash fns over shingles
_JACC_BANDS = 4      # 4 bands × r=2 → P(candidate | j=0.6) ≈ 0.83,
                     #                 P(candidate | j=0.9) ≈ 0.9996


def _jaccard_sql() -> str:
    mins = ",\n                ".join(
        f"min(substr(h{i // 4}, {1 + 8 * (i % 4)}, 8)) AS m{i}"
        for i in range(_JACC_K)
    )
    band_selects = "\n         UNION ALL\n         ".join(
        f"SELECT doc_id, {b + 1} AS band_no, m{2 * b} || m{2 * b + 1} AS sig FROM mh"
        for b in range(_JACC_BANDS)
    )
    return f"""WITH sh AS (
         SELECT doc_id,
                list_distinct(list_transform(
                  range(1, len(string_split(lower(text), ' '))),
                  i -> string_split(lower(text), ' ')[i] || ' '
                       || string_split(lower(text), ' ')[i + 1])) AS shingles
         FROM documents),
       tok AS (SELECT doc_id, unnest(shingles) AS w FROM sh),
       hs AS (SELECT doc_id, md5('j0:' || w) AS h0, md5('j1:' || w) AS h1
              FROM tok),
       mh AS (SELECT doc_id, {mins}
              FROM hs GROUP BY doc_id),
       bands AS (
         {band_selects}),
       cand AS (
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b
           ON a.band_no = b.band_no AND a.sig = b.sig AND a.doc_id < b.doc_id),
       p AS (
         SELECT c.doc_a, c.doc_b,
                round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
                      / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 6)
                  AS jaccard
         FROM cand c
         JOIN sh sa ON sa.doc_id = c.doc_a
         JOIN sh sb ON sb.doc_id = c.doc_b)
       SELECT doc_a, doc_b, jaccard FROM p WHERE jaccard >= 0.6"""


@q("dedup_ngram_jaccard", _jaccard_sql())
def dedup_ngram_jaccard(spark, sf):
    """Word-bigram shingle Jaccard near-dup pairs, candidate-blocked by
    MinHash-LSH over the shingle set (4 bands × 2 hashes) — the scale
    shape: explode → groupBy minhash → equi-join on (band, sig) →
    verify exact Jaccard ONLY on candidate pairs. No all-pairs
    comparison anywhere; the previous lang-only blocking was O(n²)
    within each language."""
    d = t(spark, sf, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        )
    )
    sh = d.select("doc_id", shingles.alias("shingles"))
    tok = sh.select("doc_id", F.explode("shingles").alias("w"))
    hs = tok.select(
        "doc_id",
        F.md5(F.concat(F.lit("j0:"), F.col("w"))).alias("h0"),
        F.md5(F.concat(F.lit("j1:"), F.col("w"))).alias("h1"),
    )
    mh = hs.groupBy("doc_id").agg(
        *[
            F.min(F.substring(f"h{i // 4}", 1 + 8 * (i % 4), 8)).alias(f"m{i}")
            for i in range(_JACC_K)
        ]
    )
    bands = None
    for b in range(_JACC_BANDS):
        band = mh.select(
            "doc_id",
            F.lit(b + 1).alias("band_no"),
            F.concat(f"m{2 * b}", f"m{2 * b + 1}").alias("sig"),
        )
        bands = band if bands is None else bands.unionByName(band)
    a, bb = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            bb,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    j = F.round(
        F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
        * F.lit(1.0)
        / F.size(F.array_union(F.col("sh_a"), F.col("sh_b"))),
        6,
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", j.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.6)
    )


_SIMHASH_BITS = 16


def _simhash_sql() -> str:
    sums = ",\n                ".join(
        f"sum(CASE WHEN (strpos('0123456789abcdef', substr(md5(w), {b + 1}, 1)) - 1) % 2 = 1 "
        f"THEN 1 ELSE -1 END) AS s{b}"
        for b in range(_SIMHASH_BITS)
    )
    bits = " + ".join(
        f"(CASE WHEN s{b} >= 0 THEN {1 << b} ELSE 0 END)" for b in range(_SIMHASH_BITS)
    )
    return f"""WITH tok AS (
         SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
         FROM documents),
       s AS (SELECT doc_id, {sums}
             FROM tok GROUP BY doc_id)
       SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM s"""


@q("dedup_simhash", _simhash_sql())
def dedup_simhash(spark, sf):
    """16-bit SimHash per document: per-bit majority vote over token
    hashes (bit source: md5 hex-digit parity — integer-exact on both
    engines). One explode + one groupBy; O(n) not O(n²)."""
    d = t(spark, sf, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    )
    h = tok.withColumn("hw", F.md5("w"))
    sums = [
        F.sum(
            F.when(
                (F.instr(F.lit("0123456789abcdef"), F.substring("hw", b + 1, 1)) - 1)
                % 2
                == 1,
                1,
            ).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(_SIMHASH_BITS)
    ]
    s = h.groupBy("doc_id").agg(*sums)
    sim = None
    for b in range(_SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return s.select("doc_id", sim.cast("long").alias("simhash"))


# --------------------------------------------------- embeddings / ANN

_NORM_CTE = """
n AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings)
"""


def _emb_norm(spark, sf):
    e = t(spark, sf, "embeddings")
    dvec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot_self = F.aggregate(
        F.zip_with(dvec, dvec, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id", "label", dvec.alias("v"), F.sqrt(dot_self).alias("nrm")
    )


def _cosine(a_v, b_v, a_n, b_n):
    dot = F.aggregate(
        F.zip_with(a_v, b_v, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot / (a_n * b_n)


@q(
    "emb_norms",
    f"""WITH {_NORM_CTE.strip()}
       SELECT vec_id, label, round(nrm, 6) AS l2_norm FROM n""",
)
def emb_norms(spark, sf):
    return _emb_norm(spark, sf).select(
        "vec_id", "label", F.round("nrm", 6).alias("l2_norm")
    )


@q(
    "emb_label_stats",
    f"""WITH {_NORM_CTE.strip()}
       SELECT label, count(*) AS n,
              CAST(sum(CAST(round(nrm, 6) AS DECIMAL(28,6))) AS DOUBLE)
                AS sum_norm
       FROM n GROUP BY label""",
)
def emb_label_stats(spark, sf):
    n = _emb_norm(spark, sf)
    return n.groupBy("label").agg(
        F.count("*").alias("n"),
        F.sum(F.round("nrm", 6).cast("decimal(28,6)")).cast("double").alias(
            "sum_norm"
        ),
    )


@q(
    "ann_brute_force_topk",
    f"""WITH {_NORM_CTE.strip()},
       qv AS (SELECT * FROM n WHERE vec_id < 5),
       p AS (SELECT qv.vec_id AS q_vec, c.vec_id AS neighbor,
                    round(list_dot_product(qv.v, c.v) / (qv.nrm * c.nrm), 6)
                      AS cos_sim
             FROM qv JOIN n c ON c.vec_id != qv.vec_id),
       r AS (SELECT *, row_number() OVER (PARTITION BY q_vec
                       ORDER BY cos_sim DESC, neighbor) AS rnk FROM p)
       SELECT q_vec, neighbor, rnk, cos_sim FROM r WHERE rnk <= 10""",
)
def ann_brute_force_topk(spark, sf):
    """Exact cosine top-k — the ANN baseline. At cluster scale the
    query side is broadcast (small) and candidates stream map-side;
    per-group top-k avoids a global sort."""
    n = _emb_norm(spark, sf)
    qv = n.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_vec"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    p = F.broadcast(qv).join(n, F.col("vec_id") != F.col("q_vec"))
    cos = F.round(_cosine(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm")), 6)
    w = W.partitionBy("q_vec").orderBy(F.desc("cos_sim"), F.asc("neighbor"))
    return (
        p.select("q_vec", F.col("vec_id").alias("neighbor"), cos.alias("cos_sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("q_vec", "neighbor", "rnk", "cos_sim")
    )


# Banded sign-LSH (random-hyperplane LSH with axis-aligned planes, in
# the banding arrangement MinHash-LSH uses): band b's signature is the
# sign pattern of dims b·R+1..b·R+R; two vectors are candidates if ANY
# band matches. Collision prob per band is p^R with p = 1 − θ/π, so
# overall recall = 1 − (1−p^R)^B — the r2 single 6-bit bucket (R=6,
# B=1) measured recall 0.04 on the fixture; R=4, B=8 measures 0.70
# top-5 / 0.73 pair recall at cos ≥ 0.35 (tests/test_ann_recall.py
# pins floors). True near-dups (cos → 1) collide with prob → 1.
_LSH_R, _LSH_B = 4, 8


def _band_sig_sql(b: int) -> str:
    return " || ".join(
        f"(CASE WHEN v[{b * _LSH_R + i}] >= 0 THEN '1' ELSE '0' END)"
        for i in range(1, _LSH_R + 1)
    )


_BANDS_CTE = "bands AS (" + " UNION ALL ".join(
    f"SELECT vec_id, {b} AS band, {_band_sig_sql(b)} AS sig FROM n"
    for b in range(_LSH_B)
) + ")"


def _band_cols():
    return [
        F.concat(
            *[
                F.when(F.element_at("v", b * _LSH_R + i) >= 0, "1")
                .otherwise("0")
                for i in range(1, _LSH_R + 1)
            ]
        )
        for b in range(_LSH_B)
    ]


def _emb_bands(n):
    """(vec_id, band, sig) — ONE scan, posexplode fan-out (a UNION of
    B projections would rescan the source B times)."""
    return n.select(
        "vec_id", F.posexplode(F.array(*_band_cols())).alias("band", "sig")
    )


@q(
    "ann_lsh_bucketed",
    f"""WITH {_NORM_CTE.strip()},
       {_BANDS_CTE},
       qb AS (SELECT * FROM bands WHERE vec_id < 20),
       cand AS (SELECT DISTINCT qb.vec_id AS q_vec, c.vec_id AS neighbor
                FROM qb JOIN bands c
                  ON c.band = qb.band AND c.sig = qb.sig
                 AND c.vec_id != qb.vec_id),
       p AS (SELECT q_vec, neighbor,
                    round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6)
                      AS cos_sim
             FROM cand JOIN n a ON a.vec_id = cand.q_vec
                       JOIN n b ON b.vec_id = cand.neighbor),
       r AS (SELECT *, row_number() OVER (PARTITION BY q_vec
                       ORDER BY cos_sim DESC, neighbor) AS rnk FROM p)
       SELECT q_vec, neighbor, rnk, cos_sim FROM r WHERE rnk <= 5""",
)
def ann_lsh_bucketed(spark, sf):
    """Banded sign-LSH ANN (the scale path): candidates share ANY of
    the B band signatures → per-band equi-join on (band, sig) instead
    of cross-join, pair-distinct, exact cosine re-rank of candidates
    only. Recall = 1 − (1−p^R)^B (see ``_LSH_R`` note) — measured 0.70
    @top-5 on the fixture vs 0.04 for the old single bucket; the
    brute-force query remains the recall-1.0 baseline. The oracle
    reproduces the same banding so results match exactly."""
    n = _emb_norm(spark, sf)
    bands = _emb_bands(n)
    qb = bands.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_vec"),
        F.col("band").alias("qband"),
        F.col("sig").alias("qsig"),
    )
    cand = (
        F.broadcast(qb)
        .join(
            bands,
            (F.col("band") == F.col("qband"))
            & (F.col("sig") == F.col("qsig"))
            & (F.col("vec_id") != F.col("q_vec")),
        )
        .select("q_vec", F.col("vec_id").alias("neighbor"))
        .distinct()
    )
    a = n.select(
        F.col("vec_id").alias("q_vec"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    p = cand.join(F.broadcast(a), "q_vec").join(
        n, F.col("vec_id") == F.col("neighbor")
    )
    cos = F.round(_cosine(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm")), 6)
    w = W.partitionBy("q_vec").orderBy(F.desc("cos_sim"), F.asc("neighbor"))
    return (
        p.select("q_vec", "neighbor", cos.alias("cos_sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("q_vec", "neighbor", "rnk", "cos_sim")
    )


@q(
    "dedup_embedding_neardup",
    f"""WITH {_NORM_CTE.strip()},
       {_BANDS_CTE},
       cnd AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
               FROM bands a JOIN bands b
                 ON a.band = b.band AND a.sig = b.sig
                AND a.vec_id < b.vec_id),
       p AS (SELECT vec_a, vec_b,
                    round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6)
                      AS cos_sim
             FROM cnd JOIN n x ON x.vec_id = cnd.vec_a
                      JOIN n y ON y.vec_id = cnd.vec_b)
       SELECT vec_a, vec_b, cos_sim FROM p WHERE cos_sim >= 0.35""",
)
def dedup_embedding_neardup(spark, sf):
    """Embedding-cosine near-duplicate pairs, banded-sign-LSH blocked:
    per-band equi-join on (band, sig) — a shuffled hash join, never the
    unblocked ``a.vec_id < b.vec_id`` BroadcastNestedLoop cross product
    — then pair-distinct and exact-cosine verification ≥ threshold.
    Measured pair recall on the fixture: 0.73 at cos ≥ 0.35 (the old
    single 6-bit bucket: 0.05); true duplicates (cos → 1) collide with
    probability → 1 in every band."""
    return _embedding_neardup_pairs(spark, sf)


def _embedding_neardup_pairs(spark, sf, threshold: float = 0.35):
    """Banded-LSH near-dup pair list (vec_a < vec_b, cos ≥
    ``threshold``) — shared by ``dedup_embedding_neardup`` (0.35) and
    the cluster-assembly query ``dedup_connected_components`` (0.25,
    looser so components are transitive chains, not just pairs)."""
    n = _emb_norm(spark, sf)
    bands = _emb_bands(n)
    cnd = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
        .distinct()
    )
    x = n.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    y = n.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos = F.round(_cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")), 6)
    return (
        cnd.join(x, "vec_a")
        .join(y, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= F.lit(threshold))
    )


# --------------------------------------- dedup clusters / IVF / chunking

_NEARDUP_PAIRS_CTE = f"""
{_BANDS_CTE},
cnd AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id),
prs AS (SELECT vec_a, vec_b
        FROM cnd JOIN n x ON x.vec_id = cnd.vec_a
                 JOIN n y ON y.vec_id = cnd.vec_b
        WHERE round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6)
              >= 0.25)
"""


@q(
    "dedup_connected_components",
    f"""WITH RECURSIVE {_NORM_CTE.strip()},
       {_NEARDUP_PAIRS_CTE.strip()},
       e AS (SELECT vec_a AS s, vec_b AS d FROM prs
             UNION ALL SELECT vec_b, vec_a FROM prs),
       reach(src, dst) AS (
         SELECT vec_id, vec_id FROM embeddings
         UNION
         SELECT r.src, e.d FROM reach r JOIN e ON r.dst = e.s
       )
       SELECT src AS vec_id, min(dst) AS component FROM reach
       GROUP BY src""",
)
def dedup_connected_components(spark, sf):
    """Near-dup *clusters* from near-dup *pairs*: hash-min label
    propagation (operators/components.py) over the sign-LSH-blocked
    pair list. component = min reachable vec_id; keeping rows where
    ``vec_id == component`` is the canonical-document selection a
    training pipeline performs after pairing. Isolated vectors are
    their own component. Per-round cost: one shuffle join + one
    groupBy-min; rounds = cluster diameter (small for near-dup
    graphs)."""
    from .operators.components import connected_components

    pairs = _embedding_neardup_pairs(spark, sf, threshold=0.25).select(
        "vec_a", "vec_b"
    )
    verts = t(spark, sf, "embeddings").select("vec_id")
    return connected_components(
        verts, pairs, id_col="vec_id", src="vec_a", dst="vec_b"
    )


@q(
    "dedup_components_star",
    f"""WITH RECURSIVE {_NORM_CTE.strip()},
       {_NEARDUP_PAIRS_CTE.strip()},
       e AS (SELECT vec_a AS s, vec_b AS d FROM prs
             UNION ALL SELECT vec_b, vec_a FROM prs),
       reach(src, dst) AS (
         SELECT vec_id, vec_id FROM embeddings
         UNION
         SELECT r.src, e.d FROM reach r JOIN e ON r.dst = e.s
       )
       SELECT src AS vec_id, min(dst) AS component FROM reach
       GROUP BY src""",
)
def dedup_components_star(spark, sf):
    """Same cluster assembly as ``dedup_connected_components`` but via
    the large-star/small-star alternation (Kiveris et al. CC-MR) —
    O(log n) rounds on ANY graph, so adversarial long duplicate chains
    cannot force O(diameter) rounds the way they can with hash-min.
    Identical per-round plan shape (join + groupBy-min); identical
    result (one shared oracle; pairwise equivalence is also
    property-tested in tests/test_components.py)."""
    from .operators.components import connected_components_star

    pairs = _embedding_neardup_pairs(spark, sf, threshold=0.25).select(
        "vec_a", "vec_b"
    )
    verts = t(spark, sf, "embeddings").select("vec_id")
    return connected_components_star(
        verts, pairs, id_col="vec_id", src="vec_a", dst="vec_b"
    )


@q(
    "ann_ivf_topk",
    f"""WITH {_NORM_CTE.strip()},
       cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n
                WHERE vec_id < 8),
       asg AS (SELECT n.vec_id, n.v, n.nrm, cid,
                      row_number() OVER (
                        PARTITION BY n.vec_id
                        ORDER BY round(list_dot_product(n.v, cv)
                                       / (n.nrm * cn), 6) DESC, cid
                      ) AS crnk
               FROM n CROSS JOIN cent),
       cell AS (SELECT vec_id, v, nrm, cid FROM asg WHERE crnk = 1),
       qprobe AS (SELECT vec_id AS q_vec, v AS qv, nrm AS qn, cid
                  FROM asg WHERE vec_id < 5 AND crnk <= 2),
       p AS (SELECT q_vec, c.vec_id AS neighbor,
                    round(list_dot_product(qv, c.v) / (qn * c.nrm), 6)
                      AS cos_sim
             FROM qprobe q JOIN cell c
               ON c.cid = q.cid AND c.vec_id != q.q_vec),
       r AS (SELECT *, row_number() OVER (PARTITION BY q_vec
                       ORDER BY cos_sim DESC, neighbor) AS rnk FROM p)
       SELECT q_vec, neighbor, rnk, cos_sim FROM r WHERE rnk <= 5""",
)
def ann_ivf_topk(spark, sf):
    """IVF (inverted-file) ANN — the other classic scale path next to
    sign-LSH: partition the corpus into cells around centroids, probe
    only the query's ``nprobe`` nearest cells. Centroids here are the
    vectors with ``vec_id < 8`` (deterministic "training" both engines
    reproduce; real k-means would be an offline job whose output lands
    in the same small broadcast table). Assignment is a broadcast
    cross-join against 8 centroids (map-side, O(n·C), no shuffle of
    the corpus) + per-vector rank; the search join is an equi-join on
    ``cid`` — candidates never leave their cell, so the plan is a
    bounded shuffled hash join instead of all-pairs."""
    n = _emb_norm(spark, sf)
    cent = n.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    ccos = F.round(_cosine(F.col("v"), F.col("cv"), F.col("nrm"), F.col("cn")), 6)
    wassign = W.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
    asg = (
        n.crossJoin(F.broadcast(cent))
        .withColumn("ccos", ccos)
        .withColumn("crnk", F.row_number().over(wassign))
    )
    cell = asg.filter(F.col("crnk") == 1).select("vec_id", "v", "nrm", "cid")
    qprobe = asg.filter((F.col("vec_id") < 5) & (F.col("crnk") <= 2)).select(
        F.col("vec_id").alias("q_vec"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"), F.col("cid").alias("qcid"),
    )
    scos = F.round(_cosine(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm")), 6)
    p = qprobe.join(
        cell, (F.col("cid") == F.col("qcid")) & (F.col("vec_id") != F.col("q_vec"))
    ).select("q_vec", F.col("vec_id").alias("neighbor"), scos.alias("cos_sim"))
    wtop = W.partitionBy("q_vec").orderBy(F.desc("cos_sim"), F.asc("neighbor"))
    return (
        p.withColumn("rnk", F.row_number().over(wtop))
        .filter(F.col("rnk") <= 5)
        .select("q_vec", "neighbor", "rnk", "cos_sim")
    )


@q(
    "text_chunk_windows",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
                  FROM documents),
       s AS (SELECT doc_id, words,
                    unnest(range(0, greatest(len(words), 1), 16)) AS start
             FROM w)
       SELECT doc_id,
              CAST(start // 16 AS INT) AS chunk_idx,
              array_to_string(list_slice(words, start + 1, start + 32), ' ')
                AS chunk_text,
              len(list_slice(words, start + 1, start + 32)) AS n_tokens
       FROM s""",
)
def text_chunk_windows(spark, sf):
    """Fixed-size token-window chunking (stride 16, window 32) — the
    standard context-length preprocessing step for LLM training data.
    Pure built-ins: split → sequence of starts → explode → slice, all
    whole-stage codegen, one narrow fan-out (no shuffle at all)."""
    d = t(spark, sf, "documents")
    w = d.select("doc_id", F.split("text", " ").alias("words"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("words") - 1, F.lit(0)), F.lit(16)
    )
    ex = w.select("doc_id", "words", F.explode(starts).alias("start"))
    chunk = F.slice(F.col("words"), F.col("start") + 1, 32)
    return ex.select(
        "doc_id",
        (F.col("start") / 16).cast("int").alias("chunk_idx"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("n_tokens"),
    )


@q(
    "sample_hash_mod",
    """SELECT doc_id, lang, n_chars FROM documents
       WHERE substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)
             IN ('0', '1', '2', '3')""",
)
def sample_hash_mod(spark, sf):
    """Deterministic ~25% sample via the last md5 hex digit of the key
    — unlike ``df.sample`` this is reproducible across engines, runs,
    AND retries (a task retry under ``sample`` can emit different rows
    per partition; hash-mod sampling cannot), which is what a training
    pipeline needs for holdout splits. Pushdown-friendly: a pure
    filter, no shuffle."""
    d = t(spark, sf, "documents")
    tail = F.substring(F.md5(F.col("doc_id").cast("string")), 32, 1)
    return d.filter(tail.isin("0", "1", "2", "3")).select(
        "doc_id", "lang", "n_chars"
    )


@q(
    "text_hof_stats",
    """SELECT doc_id,
              len(list_filter(string_split(text, ' '), x -> len(x) > 4))
                AS n_long,
              CAST(list_sum(list_transform(string_split(text, ' '),
                                           x -> len(x))) AS BIGINT)
                AS sum_len,
              list_contains(string_split(text, ' '), 'spark') AS has_spark,
              list_max(list_transform(string_split(text, ' '),
                                      x -> len(x))) AS max_len
       FROM documents""",
)
def text_hof_stats(spark, sf):
    """Higher-order array functions (SURVEY §2.B array family, lambda
    forms): filter / aggregate / exists / transform+array_max — all
    JVM-side expression evaluation over the token array, zero Python,
    zero shuffle."""
    d = t(spark, sf, "documents")
    w = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(F.filter(w, lambda x: F.length(x) > 4)).alias("n_long"),
        F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
        .cast("long")
        .alias("sum_len"),
        F.exists(w, lambda x: x == F.lit("spark")).alias("has_spark"),
        F.array_max(F.transform(w, lambda x: F.length(x))).alias("max_len"),
    )


# ------------------------------- cluster summary / sampling / quality

@q(
    "dedup_cluster_summary",
    f"""WITH RECURSIVE {_NORM_CTE.strip()},
       {_NEARDUP_PAIRS_CTE.strip()},
       e AS (SELECT vec_a AS s, vec_b AS d FROM prs
             UNION ALL SELECT vec_b, vec_a FROM prs),
       reach(src, dst) AS (
         SELECT vec_id, vec_id FROM embeddings
         UNION
         SELECT r.src, e.d FROM reach r JOIN e ON r.dst = e.s
       ),
       lbl AS (SELECT src AS vec_id, min(dst) AS component FROM reach
               GROUP BY src)
       SELECT vec_id, component,
              count(*) OVER (PARTITION BY component) AS cluster_size,
              vec_id = component AS is_keeper
       FROM lbl""",
)
def dedup_cluster_summary(spark, sf):
    """The join-back step after cluster assembly: every vector tagged
    with its component, the component's size, and whether it is the
    keeper (min id) a dedup pipeline retains. One extra hash
    aggregation + shuffle join over the CC labels — cluster-size
    distribution and drop-set selection come from this one frame."""
    from .operators.components import connected_components

    pairs = _embedding_neardup_pairs(spark, sf, threshold=0.25).select(
        "vec_a", "vec_b"
    )
    verts = t(spark, sf, "embeddings").select("vec_id")
    lbl = connected_components(
        verts, pairs, id_col="vec_id", src="vec_a", dst="vec_b"
    )
    sizes = lbl.groupBy("component").agg(
        F.count("*").alias("cluster_size")
    )
    return lbl.join(sizes, "component").select(
        "vec_id",
        "component",
        "cluster_size",
        (F.col("vec_id") == F.col("component")).alias("is_keeper"),
    )


@q(
    "sample_stratified_topn",
    """WITH r AS (SELECT doc_id, lang,
                         row_number() OVER (
                           PARTITION BY lang
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                         ) AS rk
                  FROM documents)
       SELECT doc_id, lang, rk FROM r WHERE rk <= 50""",
)
def sample_stratified_topn(spark, sf):
    """Stratified sampling: exactly N docs per language, chosen by md5
    hash order — deterministic across engines, runs, and task retries
    (unlike ``df.sample``), and balanced per stratum (unlike plain
    hash-mod). One shuffle on ``lang``; per-group top-k stays a
    partial top-k under the window's rank pushdown."""
    d = t(spark, sf, "documents")
    w = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 50)
    )


@q(
    "text_repetition_ratio",
    """WITH g AS (
         SELECT doc_id, lang,
                list_transform(
                  range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                  i -> string_split(text, ' ')[i] || ' ' ||
                       string_split(text, ' ')[i + 1] || ' ' ||
                       string_split(text, ' ')[i + 2]) AS tri
         FROM documents)
       SELECT doc_id, lang, len(tri) AS n_trigrams,
              CASE WHEN len(tri) = 0 THEN CAST(0.0 AS DOUBLE)
                   ELSE round(1.0 - len(list_distinct(tri)) / len(tri), 6)
              END AS rep_ratio
       FROM g""",
)
def text_repetition_ratio(spark, sf):
    """Within-document repetition (Gopher-style quality signal): the
    fraction of duplicate word trigrams. Pure expression work — build
    the trigram array with ``transform`` over an index sequence,
    compare distinct vs total — no explode, no shuffle; the quality
    filter this feeds is a plain predicate on ``rep_ratio``."""
    d = t(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    idx = F.when(
        F.size(toks) >= 3, F.sequence(F.lit(1), F.size(toks) - 2)
    ).otherwise(F.array().cast("array<int>"))
    tri = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i),
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
        ),
    )
    g = d.select("doc_id", "lang", tri.alias("tri"))
    rep = F.when(F.size("tri") == 0, F.lit(0.0)).otherwise(
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct("tri")) / F.size("tri"),
            6,
        )
    )
    return g.select(
        "doc_id",
        "lang",
        F.size("tri").alias("n_trigrams"),
        rep.alias("rep_ratio"),
    )


@q(
    "split_assign_counts",
    """SELECT lang,
              CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                        BETWEEN '0' AND 'b' THEN 'train'
                   WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                        IN ('c', 'd') THEN 'val'
                   ELSE 'test' END AS split,
              count(*) AS n_docs
       FROM documents GROUP BY ALL""",
)
def split_assign_counts(spark, sf):
    """Train/val/test holdout assignment by the first md5 hex digit of
    the key (12/2/2 of 16 ≈ 75/12.5/12.5%) — the split is a pure
    per-row function of the key, so it is stable under reshuffles,
    retries, and incremental corpus growth (a new doc never moves an
    old one between splits). The count rollup is one partial-agg
    shuffle."""
    d = t(spark, sf, "documents")
    digit = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(digit.between("0", "b"), "train")
        .when(digit.isin("c", "d"), "val")
        .otherwise("test")
    )
    return d.groupBy("lang", split.alias("split")).agg(
        F.count("*").alias("n_docs")
    )


@q(
    "text_tfidf_topk",
    """WITH tok AS (
         SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
         FROM documents),
       tf AS (SELECT doc_id, w, count(*) AS tf
              FROM tok GROUP BY doc_id, w),
       dfr AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
       n AS (SELECT count(*) AS n_docs FROM documents),
       s AS (SELECT t.doc_id, t.w,
                    round(t.tf * ln((n.n_docs + 1.0) / (d.df + 1.0)), 6)
                      AS tfidf
             FROM tf t JOIN dfr d USING (w) CROSS JOIN n),
       r AS (SELECT doc_id, w, tfidf,
                    row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, w) AS rk
             FROM s)
       SELECT doc_id, w AS term, tfidf, rk FROM r WHERE rk <= 3""",
)
def text_tfidf_topk(spark, sf):
    """Per-document top-3 TF-IDF terms — the keyword-extraction /
    feature-weighting primitive of a text pipeline. Shuffle profile:
    explode → groupBy(doc_id, w) [term frequencies] → groupBy(w)
    [document frequencies] → equi-join back on w → per-doc window
    top-k. The corpus size is a 1-row aggregate joined in via
    ``broadcast`` (never collected to the driver), so the whole plan
    stays distributed; idf = ln((N+1)/(df+1)) with 6-dp rounding for
    cross-engine float determinism.

    Known cost, accepted (same reasoning as operators/politeness.py):
    ``tf`` feeds two consumers (the doc-frequency agg and the join
    back), and Catalyst does NOT reuse the exchange between them —
    column pruning gives the two subtrees different output schemas, so
    they never canonicalize equal (verified with AQE off: no
    ReusedExchange). The explode + map-side partial agg therefore runs
    twice. The alternatives are worse at corpus scale: persisting
    ``tf`` costs O(distinct doc×term) executor memory, and a
    count-over-window df would put every occurrence of a stop word in
    ONE window partition (unsplittable straggler), whereas the
    groupBy+join shape keeps map-side combine and stays AQE
    skew-splittable."""
    d = t(spark, sf, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    )
    tf = tok.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    dfr = tf.groupBy("w").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    s = tf.join(dfr, "w").crossJoin(F.broadcast(n)).select(
        "doc_id",
        "w",
        F.round(
            F.col("tf")
            * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
            6,
        ).alias("tfidf"),
    )
    win = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("w"))
    return (
        s.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= 3)
        .select("doc_id", F.col("w").alias("term"), "tfidf", "rk")
    )


@q(
    "pipeline_training_data",
    """WITH q AS (
         SELECT doc_id, lang, text,
                string_split(lower(text), ' ') AS toks,
                round(len(list_distinct(string_split(text, ' '))) * 1.0
                      / len(string_split(text, ' ')), 6) AS diversity
         FROM documents),
       kept AS (SELECT * FROM q
                WHERE diversity >= 0.5
                  AND len(toks) BETWEEN 10 AND 100000),
       fp AS (SELECT *,
                     md5(array_to_string(list_sort(list_distinct(toks)),
                         ' ')) AS fp_tokenset
              FROM kept),
       dedup AS (SELECT * FROM (
                   SELECT *, row_number() OVER (
                     PARTITION BY fp_tokenset ORDER BY doc_id) AS rn
                   FROM fp) WHERE rn = 1),
       final AS (
         SELECT lang,
                CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                          BETWEEN '0' AND 'b' THEN 'train'
                     WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                          IN ('c', 'd') THEN 'val'
                     ELSE 'test' END AS split,
                len(toks) AS n_tokens,
                1 + (len(toks) - 1) // 16 AS n_chunks
         FROM dedup)
       SELECT lang, split, count(*) AS n_docs,
              CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
              CAST(sum(n_chunks) AS BIGINT) AS total_chunks
       FROM final GROUP BY lang, split""",
)
def pipeline_training_data(spark, sf):
    """END-TO-END training-data pipeline in one DataFrame DAG — the
    composition story: quality gate (token diversity ≥ 0.5, length
    bounds) → exact dedup (tokenset fingerprint, keeper = min doc_id)
    → stride-16 chunk accounting → hash-stable train/val/test split →
    per (lang, split) corpus stats. One narrow pass until the dedup
    window (single shuffle on fp_tokenset) and the final rollup
    (second shuffle) — the whole preprocessing chain costs exactly two
    exchanges, and every stage is an operator this registry also
    checks in isolation."""
    d = t(spark, sf, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    raw_toks = F.split(F.col("text"), " ")
    diversity = F.round(
        F.size(F.array_distinct(raw_toks)) * F.lit(1.0) / F.size(raw_toks), 6
    )
    q_ = d.select(
        "doc_id", "lang", toks.alias("toks"), diversity.alias("diversity")
    )
    kept = q_.filter(
        (F.col("diversity") >= 0.5) & F.size("toks").between(10, 100000)
    )
    fp = kept.withColumn(
        "fp_tokenset",
        F.md5(F.array_join(F.sort_array(F.array_distinct("toks")), " ")),
    )
    w = W.partitionBy("fp_tokenset").orderBy("doc_id")
    dedup = fp.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    digit = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(digit.between("0", "b"), "train")
        .when(digit.isin("c", "d"), "val")
        .otherwise("test")
    )
    nt = F.size("toks")
    final = dedup.select(
        "lang",
        split.alias("split"),
        nt.alias("n_tokens"),
        (1 + F.floor((nt - 1) / 16)).cast("int").alias("n_chunks"),
    )
    return final.groupBy("lang", "split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_chunks").cast("long").alias("total_chunks"),
    )


@q(
    "dedup_repeated_segments",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
                  FROM documents),
       s AS (SELECT doc_id, t.start,
                    array_to_string(
                      list_slice(words, t.start + 1, t.start + 8), ' ')
                      AS seg
             FROM w, unnest(range(0, greatest(len(words), 1), 8))
                       AS t(start)),
       d AS (SELECT md5(seg) AS h, count(DISTINCT doc_id) AS df
             FROM s GROUP BY md5(seg)),
       k AS (SELECT s.doc_id, s.start, s.seg
             FROM s JOIN d ON md5(s.seg) = d.h WHERE d.df < 3),
       ka AS (SELECT doc_id, count(*) AS n_kept,
                     md5(array_to_string(list(seg ORDER BY start), ' '))
                       AS cleaned_md5
              FROM k GROUP BY doc_id),
       tot AS (SELECT doc_id, count(*) AS n_segments FROM s
               GROUP BY doc_id)
       SELECT tot.doc_id, tot.n_segments,
              coalesce(ka.n_kept, 0) AS n_kept,
              coalesce(ka.cleaned_md5, md5('')) AS cleaned_md5
       FROM tot LEFT JOIN ka ON tot.doc_id = ka.doc_id""",
)
def dedup_repeated_segments(spark, sf):
    """CCNet-style boilerplate removal: non-overlapping 8-token
    segments fingerprinted with md5; a segment appearing in ≥3
    DISTINCT documents is boilerplate (nav bars, footers, templated
    spans in a web corpus) and is dropped from every document; the
    cleaned document is the surviving segments re-joined in original
    order (order-preserving recombine = sort_array over (start, seg)
    structs — collect_list alone has no order guarantee). Shuffle
    profile: explode → groupBy(seg hash) [df counts, map-side combine]
    → equi-join back on the hash → groupBy(doc). All-document segment
    frequency is exactly the kind of corpus-global statistic that
    needs an engine, not a per-doc UDF."""
    d = t(spark, sf, "documents")
    w = d.select("doc_id", F.split("text", " ").alias("words"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("words") - 1, F.lit(0)), F.lit(8)
    )
    s = w.select(
        "doc_id", F.explode(starts).alias("start"),
        "words",
    ).select(
        "doc_id", "start",
        F.array_join(F.slice("words", F.col("start") + 1, 8), " ").alias("seg"),
    )
    dfreq = s.groupBy(F.md5("seg").alias("h")).agg(
        F.countDistinct("doc_id").alias("df")
    )
    k = s.join(dfreq, F.md5(s["seg"]) == dfreq["h"]).filter(F.col("df") < 3)
    ka = k.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("start", "seg"))),
                    lambda x: x["seg"],
                ),
                " ",
            )
        ).alias("cleaned_md5"),
    )
    tot = s.groupBy("doc_id").agg(F.count("*").alias("n_segments"))
    return tot.join(ka, "doc_id", "left").select(
        "doc_id",
        "n_segments",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("cleaned_md5", F.md5(F.lit(""))).alias("cleaned_md5"),
    )


@q(
    "dedup_decontaminate",
    """WITH g AS (
         SELECT doc_id,
                list_distinct(list_transform(
                  range(1, greatest(len(string_split(lower(text), ' ')) - 1,
                                    1)),
                  i -> array_to_string(list_slice(
                         string_split(lower(text), ' '), i, i + 2), ' ')))
                  AS grams
         FROM documents),
       bench AS (SELECT DISTINCT unnest(grams) AS g FROM g
                 WHERE doc_id < 10),
       hits AS (SELECT t.doc_id, count(*) AS n_hits
                FROM (SELECT doc_id, unnest(grams) AS g FROM g
                      WHERE doc_id >= 10) t
                JOIN bench ON t.g = bench.g
                GROUP BY t.doc_id)
       SELECT doc_id, n_hits FROM hits""",
)
def dedup_decontaminate(spark, sf):
    """Benchmark decontamination: training docs sharing any 3-gram
    with the held-out eval set (here: doc_id < 10 stands in for the
    benchmark) are flagged with their overlap count — the standard
    eval-leak scrub before LLM training. Shape: the benchmark n-gram
    set is tiny → broadcast; the training side explodes its distinct
    3-grams and inner-joins (broadcast hash, zero shuffle of the
    corpus side beyond the final per-doc count). At 100 TB the
    benchmark side stays a broadcast blob; only flagged docs leave
    the scan."""
    d = t(spark, sf, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    idx = F.sequence(
        F.lit(1), F.greatest(F.size(toks) - 2, F.lit(0))
    )
    grams = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.array_join(F.slice(toks, i, 3), " "),
        )
    )
    g = d.select("doc_id", grams.alias("grams"))
    bench = (
        g.filter(F.col("doc_id") < 10)
        .select(F.explode("grams").alias("g"))
        .distinct()
    )
    train = g.filter(F.col("doc_id") >= 10).select(
        "doc_id", F.explode("grams").alias("g")
    )
    return (
        train.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


@q(
    "text_vocab_coverage",
    """WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS w
                    FROM documents),
       vf AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
       n AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vf),
       top AS (SELECT w, cnt,
                      row_number() OVER (ORDER BY cnt DESC, w) AS rank
               FROM vf
               ORDER BY cnt DESC, w LIMIT 100)
       SELECT rank, w AS token, cnt,
              round(sum(cnt) OVER (ORDER BY rank) * 1.0 / n.total, 6)
                AS cum_coverage
       FROM top, n""",
)
def text_vocab_coverage(spark, sf):
    """Vocabulary build: global top-100 tokens by frequency with the
    cumulative fraction of ALL corpus tokens they cover (the coverage
    curve that sizes a tokenizer vocab). Scale shape: the frequency
    table is a map-side-combined groupBy; the top-K is a distributed
    ``orderBy().limit(K)`` (TakeOrderedAndProject — per-partition
    top-K then driver merge of K×partitions rows, never a global
    sort); only the K surviving rows pass through the unpartitioned
    running-sum window, so the partitionless window is bounded by K,
    not by vocabulary size. Total token count joins in as a broadcast
    1-row aggregate."""
    d = t(spark, sf, "documents")
    tok = d.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
    vf = tok.groupBy("w").agg(F.count("*").alias("cnt"))
    total = vf.agg(F.sum("cnt").cast("long").alias("total"))
    top = vf.orderBy(F.desc("cnt"), F.asc("w")).limit(100)
    wrk = W.orderBy(F.desc("cnt"), F.asc("w"))
    ranked = top.select(
        F.row_number().over(wrk).alias("rank"), F.col("w").alias("token"),
        "cnt",
    ).crossJoin(F.broadcast(total))
    wcum = W.orderBy("rank")
    return ranked.select(
        "rank", "token", "cnt",
        F.round(
            F.sum("cnt").over(wcum) * F.lit(1.0) / F.col("total"), 6
        ).alias("cum_coverage"),
    )


# -------------------------------------------------- r3 pipeline additions

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+1 [0-9]{3}-[0-9]{4}-[0-9]{4}"


@q(
    "text_pii_scrub",
    f"""WITH aug AS (
         SELECT doc_id,
                text || ' contact user' || doc_id || '@site'
                     || (doc_id % 50) || '.example or +1 555-'
                     || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     || '-0199' AS t
         FROM documents)
       SELECT doc_id,
              md5(regexp_replace(
                    regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                    '{_PHONE_RE}', '<PHONE>', 'g')) AS scrub_md5,
              len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_emails,
              len(regexp_extract_all(t, '{_PHONE_RE}')) AS n_phones
       FROM aug""",
)
def text_pii_scrub(spark, sf):
    """PII scrubbing — the redaction pass every shared training corpus
    runs before release. The synthetic corpus carries no PII, so the
    query APPENDS deterministic email/phone strings (pure function of
    doc_id, identical in both engines) and then scrubs them — the
    regex machinery is exercised for real (n_emails/n_phones ≥ 1 per
    doc, md5 of the scrubbed text is the byte-level contract). Both
    patterns stay inside the syntax Java regex and RE2 share (classes,
    quantifiers — no backrefs/lookahead). Scale: pure JVM expressions,
    one scan, zero shuffle."""
    d = t(spark, sf, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"),
            F.col("doc_id").cast("string"), F.lit("@site"),
            (F.col("doc_id") % 50).cast("string"),
            F.lit(".example or +1 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit("-0199"),
        ).alias("t"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace("t", F.lit(_EMAIL_RE), F.lit("<EMAIL>")),
        F.lit(_PHONE_RE), F.lit("<PHONE>"),
    )
    return aug.select(
        "doc_id",
        F.md5(scrubbed).alias("scrub_md5"),
        F.size(F.regexp_extract_all("t", F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(_PHONE_RE), 0)).alias("n_phones"),
    )


@q(
    "text_unigram_entropy",
    """WITH tok AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS w
         FROM documents),
       cnt AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY ALL),
       tot AS (SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n FROM cnt
               GROUP BY doc_id)
       SELECT cnt.doc_id,
              CAST(n AS BIGINT) AS n_tokens,
              round(-sum((c / n) * ln(c / n)), 5) AS entropy
       FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
       GROUP BY cnt.doc_id, n""",
)
def text_unigram_entropy(spark, sf):
    """Unigram (token) Shannon entropy per document — the cheap
    perplexity proxy quality filters use (low entropy = repetitive /
    boilerplate, suspiciously high = token soup). One explode +
    two map-side-combined groupBys; ln is IEEE-correctly-rounded in
    both engines and the 5-dp round absorbs summation-order ulp."""
    d = t(spark, sf, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    cnt = tok.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    # per-doc total via a window, not a separate agg + join-back: the
    # window's doc_id exchange is then REUSED by the final groupBy
    # (2 exchanges total instead of 5)
    n = F.sum("c").over(W.partitionBy("doc_id")).cast("double")
    p = F.col("c") / F.col("n")
    return (
        cnt.withColumn("n", n)
        .groupBy("doc_id", "n")
        .agg(F.round(-F.sum(p * F.log(p)), 5).alias("entropy"))
        .select(
            "doc_id", F.col("n").cast("long").alias("n_tokens"), "entropy"
        )
    )


@q(
    "text_length_outliers",
    """SELECT doc_id, lang, n_chars, round(pr, 6) AS pct_rank
       FROM (SELECT doc_id, lang, n_chars,
                    percent_rank() OVER (PARTITION BY lang
                                         ORDER BY n_chars, doc_id) AS pr
             FROM documents)
       WHERE pr >= 0.02 AND pr <= 0.98""",
)
def text_length_outliers(spark, sf):
    """Per-language length-outlier trim — drop the shortest/longest 2%
    per lang (truncation artifacts and concatenation blobs) before
    training. percent_rank over (n_chars, doc_id) is a strict total
    order so both engines rank identically; the window partitions by
    lang (bounded partitions, no partitionless window)."""
    d = t(spark, sf, "documents")
    wl = W.partitionBy("lang").orderBy(F.asc("n_chars"), F.asc("doc_id"))
    return (
        d.select(
            "doc_id", "lang", "n_chars",
            F.percent_rank().over(wl).alias("pr"),
        )
        .filter((F.col("pr") >= 0.02) & (F.col("pr") <= 0.98))
        .select(
            "doc_id", "lang", "n_chars", F.round("pr", 6).alias("pct_rank")
        )
    )


@q(
    "text_search_ranked",
    """WITH tok AS (
         SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
         FROM documents),
       tf AS (
         SELECT doc_id, w, count(*) AS tf
         FROM tok WHERE w IN ('vector', 'stream', 'spark')
         GROUP BY doc_id, w),
       dfr AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
       n AS (SELECT count(*) AS n_docs FROM documents),
       scored AS (
         SELECT tf.doc_id,
                round(sum(tf.tf * ln((n.n_docs + 1.0) / (dfr.df + 1.0))), 6)
                  AS score,
                count(*) AS n_terms_matched
         FROM tf JOIN dfr USING (w) CROSS JOIN n
         GROUP BY tf.doc_id),
       ranked AS (
         SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
         FROM scored)
       SELECT CAST(rnk AS INT) AS rank,
              CAST((rnk - 1) // 5 + 1 AS INT) AS page,
              doc_id, score, n_terms_matched
       FROM ranked WHERE rnk <= 20""",
)
def text_search_ranked(spark, sf):
    """Ranked keyword search with result pagination — full parity for
    §2.A A10 (the reference's ``search_by_query(q)`` cursor-paginates
    search results; ``[U-med] twitter_api.py``): score = sum of
    TF-IDF over matched query terms, top-20 by (score desc, doc_id),
    ``page`` = the reference's cursor, 5 hits per page. Shuffle
    profile: the term filter lands directly on the exploded tokens
    (only query-term rows survive into the groupBy — candidate volume
    is O(hits), not O(corpus tokens)); df comes from the same tiny tf
    set; n_docs is a broadcast 1-row total (allowlisted BNLJ, same as
    text_tfidf_topk). The global order is orderBy+limit —
    TakeOrderedAndProject, a distributed partial top-k, NOT a
    partitionless window; row_number runs on the 20 survivors only."""
    terms = ["vector", "stream", "spark"]
    d = t(spark, sf, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    )
    tf = (
        tok.filter(F.col("w").isin(terms))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    dfr = tf.groupBy("w").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfr, "w")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(
                    F.col("tf")
                    * F.log(
                        (F.col("n_docs") + F.lit(1.0))
                        / (F.col("df") + F.lit(1.0))
                    )
                ),
                6,
            ).alias("score"),
            F.count("*").alias("n_terms_matched"),
        )
    )
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)
    wr = W.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(wr)).select(
        "rank",
        (F.floor((F.col("rank") - 1) / 5) + 1).cast("int").alias("page"),
        "doc_id",
        "score",
        "n_terms_matched",
    )
