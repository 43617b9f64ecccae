"""Multimodal-column oracle queries (binary payloads + typed metadata).

The driver testdata has no media table, so one is **derived
deterministically from `events`** in both engines (same trick as the
crawl frontier view, FIXTURES.md §F): payload bytes come from
md5-in-hex expansion of the event id, so DuckDB and Spark construct
byte-identical blobs and every metadata op is oracle-checkable. The
codec-dependent ops (decode → features, frame content) are rows-only
by design (SURVEY.md §5: genuinely non-SQL-expressible), but their
*shape* invariants (frame counts) are oracle-checked against SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .multimodal import decode_features, sample_frames
from .queries import Q, t

MEDIA: dict[str, Q] = {}


def q(name: str, oracle: str | None):
    def deco(fn):
        MEDIA[name] = Q(fn, oracle)
        return fn
    return deco


# Derived media table — keep the two constructions in lockstep.
MEDIA_CTE = """
media AS (
  SELECT event_id AS media_id,
         CASE WHEN event_id % 3 = 0 THEN 'image'
              WHEN event_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         unhex(substr(repeat(md5(CAST(event_id AS VARCHAR)), 4),
                      1, CAST(2 * (8 + event_id % 48) AS INTEGER))) AS payload
  FROM events)
"""


def media_df(spark, sf):
    e = t(spark, sf, "events")
    return e.select(
        F.col("event_id").alias("media_id"),
        F.when(F.col("event_id") % 3 == 0, "image")
        .when(F.col("event_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.unhex(
            F.expr(
                "substring(repeat(md5(cast(event_id as string)), 4), 1, "
                "cast(2 * (8 + event_id % 48) as int))"
            )
        ).alias("payload"),
    )


@q(
    "media_metadata",
    f"""WITH {MEDIA_CTE.strip().rstrip(')')})
       SELECT media_id, media_type,
              octet_length(payload) AS byte_len,
              md5(hex(payload)) AS payload_md5
       FROM media""",
)
def media_metadata(spark, sf):
    m = media_df(spark, sf)
    return m.select(
        "media_id",
        "media_type",
        F.length("payload").cast("int").alias("byte_len"),
        F.md5(F.hex("payload")).alias("payload_md5"),
    )


@q(
    "media_type_stats",
    f"""WITH {MEDIA_CTE.strip().rstrip(')')})
       SELECT media_type, count(*) AS n,
              CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
              CAST(min(octet_length(payload)) AS INTEGER) AS min_bytes,
              CAST(max(octet_length(payload)) AS INTEGER) AS max_bytes
       FROM media GROUP BY media_type""",
)
def media_type_stats(spark, sf):
    m = media_df(spark, sf)
    bl = F.length("payload")
    return m.groupBy("media_type").agg(
        F.count("*").alias("n"),
        F.sum(bl).cast("long").alias("total_bytes"),
        F.min(bl).cast("int").alias("min_bytes"),
        F.max(bl).cast("int").alias("max_bytes"),
    )


@q(
    "media_frame_counts",
    f"""WITH {MEDIA_CTE.strip().rstrip(')')})
       SELECT media_id,
              greatest(1, octet_length(payload) // 16) AS n_frames
       FROM media WHERE media_type = 'video'""",
)
def media_frame_counts(spark, sf):
    """Shape invariant of the frame-sampling UDTF: the Spark side
    counts rows actually emitted by ``sample_frames`` (mapInPandas);
    the oracle computes the closed form — UDF vs SQL agreement."""
    frames = sample_frames(media_df(spark, sf), every_n_bytes=16)
    return frames.groupBy("media_id").agg(
        F.count("*").cast("long").alias("n_frames")
    )


# fake-decode feature term j, as SQL: first 8 hex chars of
# md5(upper(hex(payload)) || ':' || j) read as int32, over 2^32 —
# the exact expression _fake_feature computes (multimodal.py), so the
# mapInPandas kernel's output has a FULL value oracle. int32/2^32 is
# exact in float64 and the sum folds left-to-right in both engines,
# so the doubles agree bit-for-bit before the round.
_FEAT_TERM = (
    "CAST(CAST('0x' || substr(md5(upper(hex(payload)) || ':{j}'), 1, 8)"
    " AS BIGINT) AS DOUBLE) / 4294967296"
)
_FEAT_SUM_SQL = " + ".join(_FEAT_TERM.format(j=j) for j in range(8))


@q(
    "media_decode_features",
    f"""WITH {MEDIA_CTE.strip().rstrip(')')})
       SELECT media_id, media_type,
              octet_length(payload) AS byte_len,
              8 AS feat_dim,
              round({_FEAT_SUM_SQL}, 6) AS feat_sum
       FROM media""",
)
def media_decode_features(spark, sf):
    """The decode → feature mapInPandas pipeline (§2.C media row), with
    a full value oracle over the deterministic fake path: the feature
    derivation is md5-over-hex-text (multimodal._fake_feature), which
    DuckDB's VARCHAR-only md5 states directly. ``fake=False`` still
    raises (codec honesty pinned by tests/test_multimodal.py)."""
    feats = decode_features(media_df(spark, sf), fake=True)
    return feats.select(
        "media_id",
        "media_type",
        "byte_len",
        "feat_dim",
        F.round(F.aggregate("feature", F.lit(0.0),
                            lambda a, x: a + x.cast("double")), 6)
        .alias("feat_sum"),
    )
