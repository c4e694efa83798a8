"""spark-frontier: a PySpark-native URL-frontier + fetch scheduler.

Brand-new engine (NOT a port) with the query/data-processing
capabilities of the reference `yindaheng98/dblp-crawler` (read-only at
/root/reference). The reference is a single-process asyncio crawler;
this engine re-expresses its BFS expansion, seen-set dedup, filter
pushdown, politeness, and summarization as distributed DataFrame
plans. See SURVEY.md for the operator-by-operator mapping.
"""

from .session import get_spark  # noqa: F401

__version__ = "0.1.0"
