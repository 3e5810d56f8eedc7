"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (full per-partition validation verdict
matrix over the clips table at sf0.001); ``queries``/``oracle_sql`` expose
every implemented operator with DuckDB oracles where ANSI-SQL-expressible
(see drift_detection_pibic___framework_spark/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from drift_detection_pibic___framework_spark import queries as Q  # noqa: E402
from drift_detection_pibic___framework_spark.sources import generators as G  # noqa: E402

# the DuckDB oracle reads the sf0.01 clips fixture by absolute path — make
# sure it exists regardless of evaluation order (generation is idempotent,
# seed 42, ~15 s once)
G.ensure_fixtures("sf0.01")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full check-suite verdicts for every partition of the
    sf0.001 clips table (stats + uniqueness + referential + drift)."""
    from drift_detection_pibic___framework_spark.plans import suite

    d = G.ensure_fixtures("sf0.001")
    clips = spark.read.parquet(f"{d}/clips")
    dim = spark.read.parquet(f"{d}/allowed_codecs.parquet")
    return (suite.suite_verdicts(clips, dim)
            .orderBy("part", "check_name"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
