"""Training-data pipeline queries (dedup / text analysis / similarity).

Placeholder registry — populated by operators as they land.
name → (spark_fn, oracle_sql | None)
"""

from __future__ import annotations

PIPELINE: dict = {}
