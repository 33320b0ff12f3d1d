"""lit_double_array must be PLAN-IDENTICAL to the per-element
F.lit form: same Literal doubles, same results — only the driver-side
construction cost differs (one py4j/parser call vs one per element)."""

import math
import random

from pyspark.sql import functions as F

from goka_spark.functions.similarity import _dlit, lit_double_array


def test_dlit_round_trips_exactly():
    rng = random.Random(7)
    vals = ([0.0, -0.0, 1.0, -1.5, 1e-300, -1e300, 0.1, 2.5e-17]
            + [rng.uniform(-1, 1) for _ in range(50)]
            + [rng.gauss(0, 1e6) for _ in range(20)])
    for v in vals:
        s = _dlit(v)
        assert s.endswith("D")
        assert float(s[:-1]) == v  # repr round-trip, bit-exact


def test_dlit_rejects_non_finite():
    import pytest
    for bad in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(ValueError):
            _dlit(bad)


def test_same_literals_as_per_element_form(spark):
    rng = random.Random(42)
    xs = [rng.gauss(0, 1) for _ in range(64)] + [0.25, -3.0, 1e-9]
    df = spark.range(1)
    old = df.select(F.array(*[F.lit(float(x)) for x in xs]).alias("a"))
    new = df.select(lit_double_array(xs).alias("a"))
    # identical analyzed plans → identical Literals → identical results
    # (normalize the auto-assigned expression ids: a#1 vs a#2)
    import re

    def norm(df):
        return re.sub(r"#\d+", "#x",
                      df._jdf.queryExecution().analyzed().toString())

    assert norm(old) == norm(new)
    ra, rb = old.first()["a"], new.first()["a"]
    assert len(ra) == len(rb) == len(xs)
    for x, y in zip(ra, rb):
        assert math.isclose(x, y, rel_tol=0, abs_tol=0)  # bit-equal


def test_dot_lit_sql_bit_equal_to_column_fold(spark):
    from goka_spark.functions.similarity import dot, dot_lit_sql

    rng = random.Random(3)
    vec = [rng.gauss(0, 1) for _ in range(64)]
    w = [rng.gauss(0, 1) for _ in range(64)]
    df = spark.createDataFrame([(vec,)], "v array<double>")
    a = df.select(dot(F.col("v"), lit_double_array(w)).alias("d")).first()["d"]
    b = df.select(F.expr(dot_lit_sql("v", w)).alias("d")).first()["d"]
    assert a == b and isinstance(a, float)  # identical fold, bit-equal
