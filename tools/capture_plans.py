"""Capture .explain("formatted") output for named queries.

Usage: python tools/capture_plans.py <outdir> <suffix> [query ...]
Writes <outdir>/<query>_<suffix>.txt for each query (default: the
bench HEADLINE + HEADLINE_V2 sets).  The judge checks plan claims
against these files; capture BEFORE and AFTER each optimization.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    from goka_spark.queries import all_queries
    from goka_spark.session import get_session

    spark = get_session("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    if len(sys.argv) > 3:
        names = sys.argv[3:]
    else:
        from bench import HEADLINE, HEADLINE_V2
        names = HEADLINE + HEADLINE_V2

    for name in names:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[name](spark, sf_dir).explain("formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"captured {name}", file=sys.stderr)


if __name__ == "__main__":
    main()
