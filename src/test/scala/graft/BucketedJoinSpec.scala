package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The co-located-join evidence: with BOTH sides bucketed by the join key
  * into the same bucket count, Spark's SortMergeJoin consumes the bucket
  * layout directly — ZERO Exchange in the join plan. At 100 TB this is the
  * fact⋈fact pattern (lineitem⋈orders on orderkey): the shuffle that
  * dominates an unbucketed join is paid ONCE at write time and amortized
  * over every subsequent join. */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed-by-key tables join with zero Exchange; results match") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS graft_li_b")
    spark.sql("DROP TABLE IF EXISTS graft_ord_b")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").format("parquet").saveAsTable("graft_li_b")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").format("parquet").saveAsTable("graft_ord_b")

    // the dim side is tiny at sf0.001, so Spark would broadcast it and
    // hide the bucket story; force the merge-join path the layout exists
    // for (at 100 TB neither side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val joined = spark.table("graft_li_b")
      .join(spark.table("graft_ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"), sum("l_quantity").as("sum_qty"))

    val plan = joined.queryExecution.executedPlan.toString
    // the whole point: bucket layout replaces the shuffle on BOTH join
    // sides AND the groupBy on the same key — no Exchange anywhere
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("Bucketed: true"), plan)

    // and the layout changes nothing about the answer
    val viaBuckets = joined.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val direct = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"), sum("l_quantity").as("sum_qty"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(viaBuckets === direct)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_li_b")
      spark.sql("DROP TABLE IF EXISTS graft_ord_b")
    }
  }

  test("q_star_revenue plans a pure broadcast chain: fact side never shuffles for the join") {
    val plan = SparkEntry.queries("q_star_revenue")(spark,
        "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the only shuffles are the (region, brand) aggregation and the
    // per-region window — never a join-side repartition of the fact table
    val joins = plan.split("\n").count(_.contains("BroadcastHashJoin"))
    assert(joins === 4, s"expected 4 broadcast joins:\n$plan")
  }
}
