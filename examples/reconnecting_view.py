"""Mirror of goka examples/6-reconnecting-view (main.go:31-38,
WithViewAutoReconnect): a View that keeps serving the LATEST table
state across backing-table updates.  goka's auto-reconnect view
re-attaches to the changelog topic after broker loss; the Spark
analog re-resolves the changelog's newest epoch on each access, so a
long-lived handle never serves a frozen snapshot.

Run: python examples/reconnecting_view.py
"""

import sys
import tempfile

sys.path.insert(0, ".")

from goka_spark import View, get_session
from goka_spark.operators.changelog import ChangelogTable

spark = get_session("example-reconnecting-view")
path = tempfile.mkdtemp() + "/restartable-view-test-table"

ct = ChangelogTable(spark, path)
ct.append_delta(spark.createDataFrame([("a", 1), ("b", 2)], "key string, v int"))


class ReconnectingView:
    """view.Run + WithViewAutoReconnect: resolve the newest epoch per
    access instead of pinning the DataFrame captured at open time."""

    def __init__(self, table: ChangelogTable):
        self._ct = table

    def get(self, key):
        return View(self._ct.read_compacted()).get(key)


view = ReconnectingView(ct)
print("before update:", view.get("a"))
assert view.get("a") == {"v": 1}

# the table moves on (new epoch) while the view handle stays open —
# goka: broker reconnect replays the changelog into the local store
ct.merge(spark.createDataFrame([("a", 10), ("c", 3)], "key string, v int"))
print("after update:", view.get("a"), view.get("c"))
assert view.get("a") == {"v": 10}
assert view.get("c") == {"v": 3}

# a PINNED view (plain View over the frame read earlier) would still
# serve {"v": 1} — that's the difference auto-reconnect makes
print("OK")
