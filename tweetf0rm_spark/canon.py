"""URL canonicalization — the identity of a URL (FIXTURES.md §C).

Two implementations that must agree (property-tested in
``tests/test_canon.py``):

1. :func:`canon_url` — pure Python, the *spec*. Fully general.
2. :func:`canon_url_col` — a Spark built-in expression chain (JVM-side,
   whole-stage-codegen'd; the engine hot path). Covers every case the
   synthetic corpus produces (uppercase scheme/host, default ports,
   ``#fragment``, duplicate slashes, trailing slash, tracker params,
   unsorted *unique-key* queries). The one documented gap: for duplicate
   query keys the builtin chain orders by (key, value) while the spec
   orders by (key, first-seen); general traffic goes through
   :func:`canon_url_pandas` (Arrow-vectorized) instead.

Reference analogue: tweetf0rm dedupes crawl targets on the raw Twitter
user id (``[U] tweetf0rm/handler/crawl_user_relationship_command_handler.py``)
— ids are already canonical. For URLs the canonical form *is* the id,
so this module is the new engine's id function (BASELINE.json:L6
"canonicalized-URL xxhash64").
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "canon_url",
    "canon_url_col",
    "canon_url_pandas",
    "needs_general_canon_col",
    "host_col",
    "registered_domain_col",
    "url_hash_col",
    "TRACKER_PARAMS",
]

# Tracker params dropped during canonicalization (FIXTURES.md §C.1).
TRACKER_PARAMS = ("utm_", "fbclid")

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_HEX = "0123456789ABCDEFabcdef"


def _normalize_pct(s: str) -> str:
    """Percent-decode unreserved chars; uppercase surviving escapes."""
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 2 < n and s[i + 1] in _HEX and s[i + 2] in _HEX:
            ch = chr(int(s[i + 1 : i + 3], 16))
            if ch in _UNRESERVED:
                out.append(ch)
            else:
                out.append("%" + s[i + 1 : i + 3].upper())
            i += 3
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _is_tracker(key: str) -> bool:
    return key.startswith("utm_") or key == "fbclid"


def canon_url(url: str | None) -> str | None:
    """Canonicalize one URL per the pinned spec (FIXTURES.md §C).

    Idempotent: ``canon_url(canon_url(u)) == canon_url(u)``.
    """
    if url is None:
        return None
    u = url.strip()
    # fragment first — never part of identity
    u = u.split("#", 1)[0]
    # scheme
    if "://" in u:
        scheme, rest = u.split("://", 1)
    else:
        scheme, rest = "https", u
    scheme = scheme.lower()
    # authority / path?query
    slash = rest.find("/")
    qmark = rest.find("?")
    cut = min(x for x in (slash, qmark, len(rest)) if x >= 0)
    authority, tail = rest[:cut], rest[cut:]
    # host[:port], lowercase host, strip default port
    if "@" in authority:
        userinfo, hostport = authority.rsplit("@", 1)
        userinfo += "@"
    else:
        userinfo, hostport = "", authority
    if ":" in hostport:
        host, port = hostport.rsplit(":", 1)
        host = host.lower()
        if (scheme == "http" and port == "80") or (
            scheme == "https" and port == "443"
        ):
            hostport = host
        else:
            hostport = f"{host}:{port}"
    else:
        hostport = hostport.lower()
    # split path / query
    if tail.startswith("?"):
        path, query = "", tail[1:]
    elif "?" in tail:
        path, query = tail.split("?", 1)
    else:
        path, query = tail, ""
    # path: collapse //+, strip trailing / (root stays /), pct-normalize
    while "//" in path:
        path = path.replace("//", "/")
    if len(path) > 1 and path.endswith("/"):
        path = path.rstrip("/")
        if not path:
            path = "/"
    if not path:
        path = "/"
    path = _normalize_pct(path)
    # query: drop trackers, stable sort by key (first-seen order kept for dups)
    if query:
        pairs = []
        for part in query.split("&"):
            if not part:
                continue
            key = part.split("=", 1)[0]
            if _is_tracker(key):
                continue
            pairs.append((key, _normalize_pct(part)))
        pairs.sort(key=lambda kv: kv[0])  # stable — preserves first-seen dups
        query = "&".join(kv for _, kv in pairs)
    out = f"{scheme}://{userinfo}{hostport}{path}"
    if query:
        out += "?" + query
    return out


def canon_url_pandas(s: pd.Series) -> pd.Series:
    """Arrow-batch vectorized wrapper over the spec (general path)."""
    return s.map(canon_url, na_action="ignore")


def canon_url_col(url: Column) -> Column:
    """Spark built-in expression chain for canonicalization (hot path).

    Stays inside whole-stage codegen — no Python boundary. Matches
    :func:`canon_url` on the corpus grammar (unique query keys, no
    percent-escapes needing normalization).
    """
    u = F.trim(url)
    # strip fragment
    u = F.substring_index(u, "#", 1)
    # default scheme
    u = F.when(u.contains("://"), u).otherwise(F.concat(F.lit("https://"), u))
    scheme = F.lower(F.substring_index(u, "://", 1))
    rest_ = F.substring_index(u, "://", -1)
    # NOTE substring_index(u,'://',-1) breaks if '://' appears later; corpus
    # URLs never contain a second '://'.
    authority = F.substring_index(F.substring_index(rest_, "/", 1), "?", 1)
    after_auth = F.substring(rest_, F.length(authority) + 1, F.lit(1 << 30))
    host_port = F.lower(F.substring_index(authority, "@", -1))
    userinfo = F.when(
        authority.contains("@"),
        F.concat(F.substring_index(authority, "@", 1), F.lit("@")),
    ).otherwise(F.lit(""))
    host = F.substring_index(host_port, ":", 1)
    port = F.when(host_port.contains(":"), F.substring_index(host_port, ":", -1)).otherwise(F.lit(""))
    norm_hostport = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        host,
    ).otherwise(F.concat_ws(":", host, port))
    path = F.substring_index(after_auth, "?", 1)
    query = F.when(
        after_auth.contains("?"), F.substring_index(after_auth, "?", -1)
    ).otherwise(F.lit(""))
    # collapse duplicate slashes, strip trailing slash, default '/'
    path = F.regexp_replace(path, "/{2,}", "/")
    path = F.when(
        (F.length(path) > 1), F.regexp_replace(path, "/$", "")
    ).otherwise(path)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # query: split, drop trackers, sort by (key, kv) — unique-key identical
    kvs = F.filter(
        F.split(query, "&"),
        lambda kv: (F.length(kv) > 0)
        & ~F.split(kv, "=")[0].startswith("utm_")
        & (F.split(kv, "=")[0] != "fbclid"),
    )
    sorted_kvs = F.transform(
        F.array_sort(
            F.transform(kvs, lambda kv: F.struct(F.split(kv, "=")[0].alias("k"), kv.alias("kv")))
        ),
        lambda s: s["kv"],
    )
    norm_query = F.array_join(sorted_kvs, "&")
    base = F.concat(scheme, F.lit("://"), userinfo, norm_hostport, path)
    return F.when(norm_query == "", base).otherwise(
        F.concat(base, F.lit("?"), norm_query)
    )


def needs_general_canon_col(url: Column) -> Column:
    """TRUE iff ``url`` is outside the builtin chain's grammar and must
    take the ``canon_url_pandas`` path: percent-escapes (the chain does
    no %-normalization) or duplicate query keys (the chain sorts by
    (key, value), the spec keeps first-seen order within a key). A
    conservative superset test — routing a conforming URL to the
    general path is always safe (both implementations agree there)."""
    has_pct = url.contains("%")
    query = F.when(
        url.contains("?"), F.substring_index(F.substring_index(url, "?", -1), "#", 1)
    ).otherwise(F.lit(""))
    keys = F.transform(
        F.filter(F.split(query, "&"), lambda kv: F.length(kv) > 0),
        lambda kv: F.split(kv, "=")[0],
    )
    dup_keys = F.size(keys) != F.size(F.array_distinct(keys))
    return has_pct | dup_keys


def host_col(canon: Column) -> Column:
    """Host of an already-canonical URL (JVM-side)."""
    return F.parse_url(canon, F.lit("HOST"))


def registered_domain_col(host: Column) -> Column:
    """Last two DNS labels — the politeness + partition key.

    Test corpus uses only ``*.example`` so no public-suffix list is
    needed (FIXTURES.md §C.2); the PSL join (psl.py, broadcast
    suffix-table longest-match) slots in here for real data.
    """
    labels = F.split(host, "\\.")
    return F.when(
        F.size(labels) >= 2, F.concat_ws(".", F.slice(labels, -2, 2))
    ).otherwise(host)


def url_hash_col(canon: Column) -> Column:
    """64-bit identity key: xxhash64 over the canonical form
    (BASELINE.json:L6 'canonicalized-URL xxhash64')."""
    return F.xxhash64(canon)
