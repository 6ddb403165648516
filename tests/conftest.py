import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from mithril_spark.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=8, app_name="mithril-tests")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def small_corpus():
    from mithril_spark.fixtures import generate_pages

    return generate_pages(150, seed=42)


@pytest.fixture(scope="session")
def oracle_1shard(small_corpus):
    from mithril_spark.oracle import OracleIndex

    return OracleIndex.build(
        [(r["url"].encode(), r["html"]) for r in small_corpus], num_shards=1
    )
