"""Query registry shared by all operator modules.

Each entry pairs a Spark builder `(spark, sf_dir) -> DataFrame` with its
DuckDB oracle SQL (None ⇒ not SQL-expressible; driver runs a rows-only
check). __spark_entry__ exposes the merged registry to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = (fn, oracle.strip() if oracle else None)
        return fn

    return deco


def load_all() -> dict[str, tuple[QueryFn, str | None]]:
    """Import every module that registers queries, then return the registry."""
    import beametrics_spark.queries  # noqa: F401
    import beametrics_spark.operators.relational  # noqa: F401
    import beametrics_spark.operators.relational2  # noqa: F401
    import beametrics_spark.operators.relational3  # noqa: F401
    import beametrics_spark.operators.relational4  # noqa: F401
    import beametrics_spark.operators.relational5  # noqa: F401
    import beametrics_spark.operators.relational6  # noqa: F401
    import beametrics_spark.operators.dedup  # noqa: F401
    import beametrics_spark.operators.curation  # noqa: F401
    import beametrics_spark.operators.curation2  # noqa: F401
    import beametrics_spark.operators.curation3  # noqa: F401
    import beametrics_spark.operators.curation4  # noqa: F401
    import beametrics_spark.operators.similarity  # noqa: F401
    import beametrics_spark.operators.similarity2  # noqa: F401
    import beametrics_spark.operators.similarity3  # noqa: F401
    import beametrics_spark.operators.similarity4  # noqa: F401
    import beametrics_spark.operators.ivf  # noqa: F401
    import beametrics_spark.operators.pq  # noqa: F401
    import beametrics_spark.operators.text  # noqa: F401
    import beametrics_spark.operators.text2  # noqa: F401
    import beametrics_spark.operators.text3  # noqa: F401
    import beametrics_spark.operators.text4  # noqa: F401
    import beametrics_spark.operators.text5  # noqa: F401
    import beametrics_spark.operators.text6  # noqa: F401
    import beametrics_spark.operators.text7  # noqa: F401
    import beametrics_spark.operators.multimodal  # noqa: F401
    import beametrics_spark.operators.stream_parity  # noqa: F401
    import beametrics_spark.operators.windows_ext  # noqa: F401
    import beametrics_spark.operators.events_ext  # noqa: F401
    import beametrics_spark.operators.events2  # noqa: F401
    import beametrics_spark.operators.events3  # noqa: F401
    import beametrics_spark.operators.events4  # noqa: F401
    import beametrics_spark.operators.corpus_stats  # noqa: F401
    import beametrics_spark.operators.graph  # noqa: F401
    import beametrics_spark.operators.graph2  # noqa: F401
    import beametrics_spark.operators.mining  # noqa: F401
    import beametrics_spark.operators.profiling  # noqa: F401
    import beametrics_spark.operators.profiling2  # noqa: F401
    import beametrics_spark.operators.scale_patterns  # noqa: F401
    import beametrics_spark.operators.sampling  # noqa: F401
    import beametrics_spark.operators.dedup2  # noqa: F401
    import beametrics_spark.operators.dedup3  # noqa: F401
    import beametrics_spark.operators.retrieval  # noqa: F401
    import beametrics_spark.operators.graph3  # noqa: F401
    import beametrics_spark.operators.timeseries  # noqa: F401

    return QUERIES
