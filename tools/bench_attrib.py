#!/usr/bin/env python
"""Attribute the r2 driver-bench regressions on the crawl headliners
(VERDICT r2 "What's wrong" #3: crawl_wave_schedule 2.46→3.49 s,
crawl_politeness_topk 0.68→1.16 s at sf0.1).

Protocol: interleaved repetitions (A B C, A B C, ...) of the exact
bench.py headline queries, min-of-reps per query — the same
steal-robust protocol tools/scaling_run.py uses. Interleaving means a
steal storm hits all queries of one rep equally instead of biasing one
query; min-of-reps recovers the unloaded number. vmstat steal/idle is
sampled alongside so the attribution table can show host state.

Usage: python tools/bench_attrib.py [reps] [sf_dir]
Prints one JSON line: per-query [reps...] + min + the r1/r2 driver
numbers for comparison.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tweetf0rm_spark.session import get_spark  # noqa: E402

QUERIES = [
    "crawl_wave_schedule",
    "crawl_politeness_topk",
    "crawl_seen_anti_join",
    "window_topk_per_group",
    "stream_sessionization",
]
# driver-recorded values for context (BENCH_r01/r02.json)
R1 = {"crawl_wave_schedule": 2.46, "crawl_politeness_topk": 0.68,
      "crawl_seen_anti_join": 0.63, "window_topk_per_group": 0.575,
      "stream_sessionization": 0.458}
R2 = {"crawl_wave_schedule": 3.492, "crawl_politeness_topk": 1.155,
      "crawl_seen_anti_join": 0.748, "window_topk_per_group": 0.696,
      "stream_sessionization": 0.54}


def vmstat_steal():
    """Locate 'id'/'st' by header name — procps-ng >= 4.0 appends a
    'gu' (guest) column, so fixed negative indexes would report guest
    time as steal (ADVICE r3)."""
    try:
        lines = subprocess.run(
            ["vmstat", "1", "2"], capture_output=True, text=True, timeout=10
        ).stdout.strip().splitlines()
        hdr = next(
            line.split() for line in lines
            if "id" in line.split() and "st" in line.split()
        )
        data = lines[-1].split()
        return {"idle": int(data[hdr.index("id")]),
                "steal": int(data[hdr.index("st")])}
    except Exception:
        return {}


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]")
    import __spark_entry__ as entry

    qs = entry.queries()
    times: dict[str, list[float]] = {q: [] for q in QUERIES}
    host: list[dict] = []
    for _ in range(reps):
        host.append(vmstat_steal())
        for name in QUERIES:
            df = qs[name](spark, sf)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            times[name].append(round(time.time() - t0, 3))
    out = {
        "sf": sf, "cpus": cpus, "reps": reps, "host": host,
        "queries": {
            q: {"reps": ts, "min": min(ts), "r1_driver": R1.get(q),
                "r2_driver": R2.get(q)}
            for q, ts in times.items()
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
