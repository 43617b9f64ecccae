"""tweetf0rm_spark — a from-scratch PySpark-native distributed URL-frontier
crawl scheduler with the query/data-processing capabilities of the
``bianjiang/tweetf0rm`` reference (redis-queue + multiprocessing Twitter
crawler), re-expressed Spark-first over Common-Crawl-style page tables.

Reference parity map (see SURVEY.md §2.A; reference paths are public
knowledge of bianjiang/tweetf0rm, unverifiable locally — /root/reference
is empty):

- redis NodeQueue / NodeCoordinator  -> sorted ``frontier`` snapshot table
- crawler dispatch loop              -> one wave = one DataFrame job
- seen-set redis membership check    -> anti-join + bloom/cuckoo filters
- rate-limit sleeps                  -> per-registered-domain politeness window
- BFS depth-1 expansion              -> explode(outlinks) -> depth+1 union
- FileHandler buckets                -> partitioned parquet snapshot store
"""

__version__ = "0.1.0"
