package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public
  * `Column` API. Spark 4 made `Column(expr)` private (`ExpressionUtils` is
  * `private[sql]`), so this one-file re-export lives in the
  * `org.apache.spark.sql` package — the standard technique third-party Spark
  * extensions use for expressions that cannot be built through the SQL
  * function registry (here: the annotate `Generator`, whose constructor
  * carries `Broadcast` handles that have no SQL-literal representation).
  * No Spark internals are modified or shadowed.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Java-serializable wrapper for a Hadoop `Configuration` (Spark's own
    * `SerializableConfiguration` is `private[spark]`) — lets executor-side
    * sinks resolve filesystems with the SESSION's Hadoop conf (s3a
    * credentials, endpoints, fs.* overrides set via spark.hadoop.*) instead
    * of a bare `new Configuration()` that only sees core-site.xml. */
  final class SerializableHadoopConf(@transient var value: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }
}
