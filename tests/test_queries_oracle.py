"""Every oracle-backed query must match DuckDB (the driver's t2 gate,
run here at sf0.001 for speed; tools/verify_local.py runs sf0.01)."""

import os

import pandas as pd
import pytest

# data-derived oracles (ANN centroid/codebook literals) must be built
# from the SAME sf the queries run at — the conftest sf_dir
from conftest import SF_DIR

os.environ["GOKA_SPARK_ORACLE_SF"] = SF_DIR

from goka_spark.queries import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == "float64":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        assert len(sdf) > 0, f"{name}: rows-only query returned 0 rows"
        return
    odf = duck.sql(ORACLES[name]).df()
    s, o = normalize(sdf), normalize(odf)
    assert list(s.columns) == list(o.columns)
    assert len(s) == len(o), f"rows {len(s)} != {len(o)}"
    pd.testing.assert_frame_equal(s, o, check_dtype=True)
