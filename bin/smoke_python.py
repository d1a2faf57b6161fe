"""Python-surface smoke test: run via bin/pyspark or spark-submit.

    bin/pyspark < /dev/null  # interactive
    /opt/spark/bin/spark-submit --jars <graft jar> bin/smoke_python.py

Proves the two install paths (extension conf + Py4J hook) and that sketch
SQL executes JVM-side from Python.
"""
from pyspark.sql import SparkSession

spark = (SparkSession.builder
         .master("local[2]")
         .appName("graft-python-smoke")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "2")
         .getOrCreate())

# Py4J hook (idempotent even when the extension already registered everything)
spark._jvm.org.apache.spark.api.python.GraftPythonApi.install(spark._jsparkSession)

df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
agg = (df.selectExpr(
    "approx_percentile_ex(l_quantity, 0.5) AS p50",
    "approx_count_distinct_ex(l_orderkey) AS nd")
    .collect()[0])
assert agg.p50 is not None and agg.nd > 0, agg
scalar = (df.selectExpr("size(graft_minhash(split(lower(l_returnflag), ' '), 16)) AS mh")
          .collect()[0])
assert scalar.mh == 16, scalar
print("PYTHON-SMOKE OK", agg, scalar)
spark.stop()
