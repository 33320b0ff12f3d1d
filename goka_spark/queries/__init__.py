"""Registry of all implemented queries + DuckDB oracles.

``__spark_entry__.py`` re-exports these; every SURVEY.md §2 row with a
query key lives here.  Convention: group keys are the string column
``key``; every computed column is aliased identically in the Spark
plan and the oracle SQL (driver hash-compares by column name).
"""

from goka_spark.queries import analytics, core, llmdata


def all_queries():
    q = {}
    q.update(core.QUERIES)
    q.update(analytics.QUERIES)
    q.update(llmdata.QUERIES)
    return q


def all_oracles():
    o = {}
    o.update(core.ORACLES)
    o.update(analytics.ORACLES)
    o.update(llmdata.ORACLES)
    return o
