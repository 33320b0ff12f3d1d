"""C-block queries — LLM-data-pipeline operators. (filled in §7 step 4)"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
