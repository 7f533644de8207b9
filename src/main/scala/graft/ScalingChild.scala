package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: materialize the amplified scaling corpus once (same parameters
  * as the bench) so A/B runs of [[ScalingChild]] don't pay re-materialization. */
object CorpusPrep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val path = if (args.nonEmpty) args(0) else "/tmp/graft-bench-corpus"
    val amplify = sys.env.getOrElse("SPARK_GRAFT_AMPLIFY", "400").toInt
    val pad = sys.env.getOrElse("SPARK_GRAFT_PAD", "19").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = Bench.materializeScalingCorpus(spark, sfDir, amplify, pad, path, files = 32)
    println(s"CORPUS_DOCS $n")
    spark.stop()
  }
}

/** Dev-only: lower-bound timings at a given core count — parquet scan floor
  * (read + decompress + sum of text bytes, no annotate) vs the full native
  * annotate — to attribute remaining wall time. */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val corpusPath = args(0)
    val cores = args(1).toInt
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val df = spark.read.parquet(corpusPath)
    df.limit(100000).agg(sum(octet_length(col("text")))).collect() // warmup
    val floors = (1 to 2).map(_ =>
      time(df.agg(sum(octet_length(col("text")))).collect()))
    println(f"FLOOR_SEC ${floors.min}%.3f")
    spark.stop()
  }
}

/** Dev-only: same-JVM interleaved A/B of the native Generator annotate vs
  * the typed mapPartitions form — removes JVM-startup and machine-drift
  * asymmetry from the comparison (both run warm, alternating). */
object ABProbe {
  def main(args: Array[String]): Unit = {
    val corpusPath = args(0)
    val cores = args(1).toInt
    val rounds = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (model, maps) = Bench.buildModel(spark)
    val corpus = spark.read.parquet(corpusPath)
    def run(native: Boolean): Double = {
      val t0 = System.nanoTime()
      val df = if (native)
        graft.annotate.NativeAnnotate.annotateTriples(corpus, model, maps, "v1")
      else
        graft.annotate.FusedAnnotate.annotateTriples(corpus, model, maps, "v1").toDF()
      df.count()
      (System.nanoTime() - t0) / 1e9
    }
    run(native = true); run(native = false) // warmup both
    val pairs = (1 to rounds).map { i =>
      val n = run(native = true)
      val f = run(native = false)
      println(f"AB round $i: native $n%.3f s, fused $f%.3f s (ratio ${f / n}%.2f)")
      (n, f)
    }
    println(f"AB BEST native ${pairs.map(_._1).min}%.3f s, fused ${pairs.map(_._2).min}%.3f s, " +
      f"speedup ${pairs.map(_._2).min / pairs.map(_._1).min}%.2fx")
    spark.stop()
  }
}

/** Child JVM for one scaling level (spawned by Bench under `taskset`): runs
  * the annotate job over the materialized corpus at local[cores] — warmup +
  * best of 2 — and prints `SCALING_SEC <s>` for the parent to parse. Being a
  * separate CPU-pinned process is the point: see Bench.pinnedScalingSec. */
object ScalingChild {
  def main(args: Array[String]): Unit = {
    val corpusPath = args(0)
    val cores = args(1).toInt
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Bench.scalingRun(spark, corpusPath, limit = 100000) // JIT/codegen warmup
    // best-of-N: sandbox noise is one-sided (hypervisor steal only slows),
    // so min wall time is the honest steady-state estimate at each level
    val best = (1 to runs).map(_ => Bench.scalingRun(spark, corpusPath)).min
    println(f"SCALING_SEC $best%.4f")
    spark.stop()
  }
}
