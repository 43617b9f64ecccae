"""Engine operators (SURVEY.md §2.B), each Spark-first:

- :mod:`.priority`   — host-credit + depth + recrawl-age scoring (A6/BFS order)
- :mod:`.dedupe`     — seen-set anti-join + probabilistic pre-filters (A7)
- :mod:`.robots`     — per-host robots.txt rule application
- :mod:`.politeness` — per-registered-domain budget, salted two-phase top-k (A5)
- :mod:`.textstats`  — language-ID / quality / token / fingerprint functions
- :mod:`.similarity` — embedding ANN + near-duplicate detection
- :mod:`.asof`       — as-of join composition
"""
