package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dict.{AutomatonBuild, DictBuild}
import graft.fixture.OntologyFixture

/** Dev-only phase profiler for the annotate job (not part of the driver
  * contract) — times each sub-phase at a given parallelism to localize
  * serial sections. */
object BenchDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = if (args.nonEmpty) args(0).toInt else 32
    val amplify = if (args.length > 1) args(1).toInt else 100
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[phase] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val dict = DictBuild.build(DictBuild.labelRows(OntologyFixture.conceptsDf(spark)))
    val model = AutomatonBuild.broadcastModel(spark, AutomatonBuild.build(spark, dict, "v1"))
    val closure = graft.graph.Closure.transitiveClosure(OntologyFixture.edgesDf(spark), 5)
      .localCheckpoint()
    val cores = spark.sparkContext.defaultParallelism

    // warmup
    val warm = graft.annotate.ScanAgg.annotateDirectAgg(
      graft.annotate.Corpus.extract(graft.annotate.Corpus.readDriverDocuments(spark, sfDir)),
      model).count()
    System.err.println(s"[phase] warmup agg rows: $warm")

    val extracted = graft.annotate.Corpus.extract(
      graft.annotate.Corpus.readDriverDocuments(spark, sfDir))
    val spread = extracted.repartition(cores * 2)
    val amplified = spread.crossJoin(broadcast(spark.range(amplify).toDF("copy")))
      .withColumn("url", concat(col("url"), lit("#"), col("copy"))).drop("copy")
    val amp = time("amplify+count")(amplified.count())
    System.err.println(s"  amplified rows: $amp")

    time("scan-only (no persist)")(
      graft.annotate.ScanAgg.annotateDirectAgg(amplified, model).count())
    val amplifiedP = amplified.persist()
    time("amplified persist")(amplifiedP.count())
    time("scan-only (cached input)")(
      graft.annotate.ScanAgg.annotateDirectAgg(amplifiedP, model).count())

    val direct = graft.annotate.ScanAgg.annotateDirectAgg(amplified, model).toDF().persist()
    time("scan+agg+persist")(direct.count())

    val hier = graft.annotate.Expand.hierarchy(direct, closure, 5, assumeUnique = true)
    time("hier")(hier.count())
    val mapped = graft.annotate.Expand.mappings(direct, OntologyFixture.mappingsDf(spark),
      assumeUnique = true)
    time("mapped")(mapped.count())
    val triples = graft.emit.Triples.assemble(direct, hier, mapped, "v1")
    time("assemble+count")(triples.count())
    spark.stop()
  }
}
