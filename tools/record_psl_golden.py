"""Record the PSL crawl golden trace (tests/test_psl_crawl.py) — run
ONCE, commit the output. Any later diff is a golden-breaking event."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_psl_crawl import GOLDEN, drive_psl_crawl  # noqa: E402
from tweetf0rm_spark.session import get_spark  # noqa: E402

if __name__ == "__main__":
    spark = get_spark("record_psl_golden", master="local[8]")
    waves = drive_psl_crawl(spark)
    with open(GOLDEN, "w") as f:
        json.dump([[list(p) for p in wave] for wave in waves], f, indent=1)
    print(f"recorded {GOLDEN}: " + ", ".join(str(len(w)) for w in waves))
    spark.stop()
