"""Property test: batch replay ≡ streaming fold.

goka's core guarantee is that a processor's table equals the fold of
its input log regardless of how the log was chunked into deliveries
(that's what changelog recovery relies on).  Here: random event logs,
random micro-batch splits — the streaming group table must equal the
batch Processor's table.
"""

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from goka_spark import AggFold, Processor, define_group, input_stream, persist
from goka_spark.streaming.runtime import StreamingProcessor, stream_from_dir
from tests.conftest import SF_DIR  # noqa: F401  (fixture import side)

SCHEMA = "key string, ts timestamp, value double"

events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=0, max_value=500),
        st.integers(min_value=-100, max_value=100),
    ),
    min_size=1,
    max_size=30,
)


def _graph():
    return define_group(
        "eq", input_stream("t"),
        persist(AggFold({
            "cnt": F.count("*"),
            "total": F.round(F.sum("value"), 3),
            "last_value": F.max_by("value", F.struct("ts", "value")),
        })),
    )


@pytest.fixture(scope="module")
def _spark():
    from goka_spark.session import get_session

    return get_session("equiv")


@given(events=events_strategy, split=st.integers(min_value=1, max_value=29))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_stream_chunking_equals_batch(events, split, _spark, tmp_path_factory):
    spark = _spark
    rows = [(k, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), float(v))
            for k, s, v in events]
    batch_df = spark.createDataFrame(rows, SCHEMA)
    expected = {
        r.key: (r.cnt, r.total, r.last_value)
        for r in Processor(_graph()).run({"t": batch_df}).table.collect()
    }

    tmp = tmp_path_factory.mktemp("eq")
    src = str(tmp / "topic")
    cut = min(split, len(rows))
    for chunk in (rows[:cut], rows[cut:]):
        if chunk:
            spark.createDataFrame(chunk, SCHEMA).coalesce(1) \
                .write.mode("append").parquet(src)

    q = StreamingProcessor(_graph()).start_table(
        {"t": stream_from_dir(spark, src, SCHEMA)},
        queryName="eq_table", checkpoint=str(tmp / "ckpt"))
    try:
        q.processAllAvailable()
        got = {r.key: (r.cnt, r.total, r.last_value)
               for r in spark.sql("select * from eq_table").collect()}
    finally:
        q.stop()
    assert got == expected
