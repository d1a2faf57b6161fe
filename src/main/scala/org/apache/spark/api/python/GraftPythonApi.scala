/**
 * Py4J entry point for PySpark users (pattern of the reference's
 * DataSketchApi, reference: DataSketchApi.scala:22-24): from a PySpark
 * session, `spark._jvm.org.apache.spark.api.python.GraftPythonApi.install(
 * spark._jsparkSession)` registers all graft SQL functions; subsequent
 * `selectExpr`/`spark.sql` calls execute entirely in the JVM — no Python
 * UDF boundary is crossed at query time.
 */
package org.apache.spark.api.python

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.GraftFunctionRegistry

object GraftPythonApi {
  def install(spark: SparkSession): Unit = {
    org.apache.spark.sql.graft.GraftConfEntries.ensureRegistered()
    GraftFunctionRegistry.install(spark)
  }
}
