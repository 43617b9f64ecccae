import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tweetf0rm_spark.datagen import gen_corpus  # noqa: E402
from tweetf0rm_spark.session import get_spark  # noqa: E402

# Golden corpus tier (FIXTURES.md §B smoke): any change to these knobs
# or to the generators/extractor is a golden-breaking event.
GOLDEN_PAGES = 600
GOLDEN_DOMAINS = 15
GOLDEN_SEEDS = 12
GOLDEN_WAVES = 3
GOLDEN_BATCH = 150


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", master="local[8]")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    return gen_corpus(GOLDEN_PAGES, GOLDEN_DOMAINS, GOLDEN_SEEDS)


@pytest.fixture(scope="session")
def corpus_dfs(spark, corpus):
    return {
        "pages": spark.createDataFrame(corpus.pages),
        "seeds": spark.createDataFrame(corpus.seeds),
        "outlinks": spark.createDataFrame(corpus.outlinks),
        "robots_rules": spark.createDataFrame(corpus.robots_rules),
        "politeness_budget": spark.createDataFrame(corpus.politeness_budget),
    }
