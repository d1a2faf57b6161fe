"""Interactive bootstrap for bin/python: install the graft sketch/
pipeline SQL functions into the already-created pyspark session through
the Py4J hook — the IMPERATIVE registration path (reference surface:
bin/.startup.py:20-30), exercised here as the alternative to the
`spark.sql.extensions` conf that bin/pyspark uses. Both paths end at
the same function registry.

Spark's own bin/pyspark chains user startup files: it stashes
PYTHONSTARTUP in OLD_PYTHONSTARTUP and its shell.py executes this file
after the session exists.
"""
from pyspark.sql import SparkSession

spark = SparkSession.builder.getOrCreate()
spark._jvm.org.apache.spark.api.python.GraftPythonApi.install(spark._jsparkSession)
print("graft SQL functions installed (Py4J imperative path).")
