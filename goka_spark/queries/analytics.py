"""B-block queries — windowed + relational analytics. (filled in §7 step 3)"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
