import duckdb
import pytest
from pyspark.sql import SparkSession

from drift_detection_pibic___framework_spark.sources import generators as G

SCALE = "sf0.001"  # fast tier; injections guaranteed at every scale


@pytest.fixture(scope="session")
def spark():
    import os
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")
    s = (SparkSession.builder.master("local[8]")
         .appName("dpf-tests")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "8g")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         # arena-reuse for python-worker numpy buffers (see bench.py note)
         .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", "1073741824")
         .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "1073741824")
         .config("spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL", "system")
         .getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def fixture_dir():
    return G.ensure_fixtures(SCALE)


@pytest.fixture(scope="session")
def clips(spark, fixture_dir):
    return spark.read.parquet(f"{fixture_dir}/clips")


@pytest.fixture(scope="session")
def clips_ref(spark, fixture_dir):
    return spark.read.parquet(f"{fixture_dir}/clips_ref")


@pytest.fixture(scope="session")
def allowed_codecs(spark, fixture_dir):
    return spark.read.parquet(f"{fixture_dir}/allowed_codecs.parquet")


@pytest.fixture(scope="session")
def drift_streams_pd(fixture_dir):
    return duckdb.sql(
        f"select * from read_parquet('{fixture_dir}/drift_streams.parquet') "
        "order by stream_id, seq").df()


@pytest.fixture(scope="session")
def duck(fixture_dir):
    con = duckdb.connect()
    con.execute(f"create view clips as select * from read_parquet('{fixture_dir}/clips/*.parquet')")
    con.execute(f"create view allowed_codecs as select * from read_parquet('{fixture_dir}/allowed_codecs.parquet')")
    return con
