import json
import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

# ---- slow-test manifest (r15 verdict ask #2) -----------------------
# Every nodeid in tests/slow_tests.json (measured >= 3 s per test on
# the full-suite profile run) is auto-marked ``slow``; pytest.ini
# deselects the mark by default so the driver-visible run finishes
# inside its budget.  New tests are NOT in the manifest and therefore
# always run.  Full suite: pytest -m "slow or not slow".
with open(os.path.join(os.path.dirname(__file__),
                       "slow_tests.json")) as _f:
    _SLOW_IDS = set(json.load(_f))
# tolerate invocation from any cwd: also match the path-less form
_SLOW_TAILS = {i.split("/")[-1] for i in _SLOW_IDS}


def pytest_collection_modifyitems(config, items):
    for item in items:
        nid = item.nodeid
        if nid in _SLOW_IDS or nid.split("/")[-1] in _SLOW_TAILS:
            item.add_marker(pytest.mark.slow)

from goka_spark.session import get_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_session("goka_spark_tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    import duckdb

    from goka_spark.queries.base import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con
