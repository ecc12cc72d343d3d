import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from sqlserver_pg_cdc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    import tempfile

    s = get_spark(
        app_name="tests",
        extra_conf={
            # static conf: must be set at session creation (bucketed-table
            # tests need a throwaway warehouse)
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark_wh_"),
            "spark.sql.catalogImplementation": "in-memory",
        },
    )
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def load(spark, table, sf_dir=SF_DIR):
    from sqlserver_pg_cdc_spark.sources.parquet import load_table

    return load_table(spark, sf_dir, table)
