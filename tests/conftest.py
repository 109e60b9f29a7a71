import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from citykg.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # the engine's default session is ANSI-off (permissive casts on dirty
    # web-scale text) but the round driver evaluates queries under Spark
    # 4's ANSI default — run the suite in the STRICTER mode so every op is
    # proven to work under both
    s = get_spark(
        "citykg-tests", master="local[8]", shuffle_partitions=8,
        extra_conf={"spark.sql.ansi.enabled": "true"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con
    con.close()
