package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge. Lives under org.apache.spark.sql
  * because the classic converters are `private[sql]` in Spark 4 — this is
  * the supported pattern for libraries shipping native expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Hadoop Configuration is not Serializable and Spark's wrapper
  * (`org.apache.spark.util.SerializableConfiguration`) is `private[spark]`;
  * this re-export lets executor-side sinks (e.g. the distributed GeoTIFF
  * writer) carry the session's Hadoop conf — including s3a credentials —
  * into tasks, the same way Spark's own file sinks do. */
object HadoopConfBridge {
  def serializable(conf: org.apache.hadoop.conf.Configuration)
      : org.apache.spark.util.SerializableConfiguration =
    new org.apache.spark.util.SerializableConfiguration(conf)
}
