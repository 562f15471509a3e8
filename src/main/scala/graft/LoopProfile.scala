package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/**
 * Driver-floor profiler for the iterative-loop query family
 * (VERDICT r4 #8): where do the 4-6 s of a loop query (q103-shaped
 * HITS) actually go at sandbox scale — Catalyst analysis of the
 * unrolled plans, checkpoint materialization jobs, or executor work?
 *
 * Measures, per checkpoint cadence (every half-step / per iteration /
 * per 2 iterations / none):
 *   - construct_sec: building the DataFrame (pure driver, no jobs —
 *     localCheckpoint(false) is lazy);
 *   - action_sec: one count() driving the whole loop;
 *   - executor_task_sec: Σ task executorRunTime across stages (the
 *     distributed work) — action_sec minus (executor_task_sec / cores)
 *     is driver overhead (plan analysis + scheduling + job gaps);
 *   - a result checksum proving every cadence computes the same scores.
 *
 * Env: SPARK_GRAFT_SF_DIR (default sf0.1), GRAFT_LOOP_ITERS (default 4),
 * GRAFT_LOOP_RERUNS (default 2; reports the best).
 */
object LoopProfile {

  private final class TaskTimeListener extends SparkListener {
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) taskMs.addAndGet(m.executorRunTime)
      ()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val iters = sys.env.getOrElse("GRAFT_LOOP_ITERS", "4").toInt
    val reruns = sys.env.getOrElse("GRAFT_LOOP_RERUNS", "2").toInt

    val nodes = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id")
      .localCheckpoint() // exclude the scan from every measured variant
    // the q103/q76 synthetic graph shape: 3 deterministic out-links per
    // non-dangling node (id%10==7 dangles), targets folded by md5-mix
    val n = nodes.count()
    val edges = nodes.filter(col("doc_id") % 10 =!= 7)
      .select(col("doc_id").as("src"),
        explode(array(lit(1), lit(2), lit(3))).as("k"))
      .select(col("src"), pmod(xxhash64(col("src") * 31 + col("k")), lit(n))
        .as("dst"))
      .filter(col("src") =!= col("dst"))
      .localCheckpoint()

    val listener = new TaskTimeListener
    spark.sparkContext.addSparkListener(listener)

    // experimental placement: checkpoint RAW (pre-normalization) instead
    // of the normalized output — the norm's crossJoin(broadcast(agg(raw)))
    // otherwise duplicates the whole half-step subtree in every analyzed
    // plan; with raw as a leaf both the agg and the crossJoin are tiny
    def rawCkHits(): org.apache.spark.sql.DataFrame = {
      val ids = nodes.select(col("doc_id").cast("long").as("id"))
      val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).localCheckpoint(false)
      def halfStep(score: org.apache.spark.sql.DataFrame, joinKey: String,
                   groupKey: String): org.apache.spark.sql.DataFrame = {
        val raw = ids.join(
            e.join(score.withColumnRenamed("id", joinKey), joinKey)
              .groupBy(groupKey).agg(sum("v").as("s"))
              .withColumnRenamed(groupKey, "id")
              .hint("shuffle_hash"),
            Seq("id"), "left")
          .select(col("id"), coalesce(col("s"), lit(0.0)).as("v"))
          .localCheckpoint(false) // the ONE ck, BEFORE the norm reuse
        val norm = broadcast(raw.agg(sqrt(sum(col("v") * col("v"))).as("__norm")))
        raw.crossJoin(norm)
          .select(col("id"), (col("v") /
            greatest(col("__norm"), lit(java.lang.Double.MIN_VALUE))).as("v"))
      }
      var hub = ids.select(col("id"), lit(1.0).as("v"))
      var auth: org.apache.spark.sql.DataFrame = null
      for (_ <- 1 to iters) {
        auth = halfStep(hub, joinKey = "src", groupKey = "dst")
        hub = halfStep(auth, joinKey = "dst", groupKey = "src")
      }
      ids.join(auth.withColumnRenamed("v", "authority").hint("shuffle_hash"),
          Seq("id"), "left")
        .join(hub.withColumnRenamed("v", "hub").hint("shuffle_hash"),
          Seq("id"), "left")
        .select(col("id").as("doc_id"), col("authority"), col("hub"))
    }

    def once(ckEvery: Int): (Double, Double, Double, Double) = {
      val t0 = System.nanoTime()
      val df = if (ckEvery == -1) rawCkHits()
      else graph.Hits.run(nodes, "doc_id", edges, "src", "dst",
        iters = iters, checkpointRounds = ckEvery > 0, ckEvery = ckEvery)
      val tc = System.nanoTime()
      val e0 = listener.taskMs.get()
      val sum = df.agg(org.apache.spark.sql.functions.sum(
        round(col("authority"), 7) + round(col("hub"), 7))).head().getDouble(0)
      val ta = System.nanoTime()
      ((tc - t0) / 1e9, (ta - tc) / 1e9,
        (listener.taskMs.get() - e0) / 1e3, sum)
    }

    val variants = Seq("ck_half" -> 1, "ck_iter" -> 2, "ck_2iter" -> 4,
      "no_ck" -> 0, "ck_raw" -> -1)
    // one untimed warmup so codegen/JIT is out of every variant
    once(1)
    val rows = variants.map { case (name, ce) =>
      val rs = (0 to reruns).map(_ => once(ce))
      val best = rs.minBy(r => r._1 + r._2)
      require(rs.map(_._4).distinct.size == 1, s"nondeterministic result at $name")
      (name, best._1, best._2, best._3, best._4)
    }
    require(rows.map(_._5).distinct.size == 1,
      s"cadences disagree: ${rows.map(r => (r._1, r._5))}")
    val js = rows.map { case (name, c, a, e, _) =>
      f"""{"variant":"$name","construct_sec":$c%.2f,"action_sec":$a%.2f,"executor_task_sec":$e%.2f}"""
    }.mkString("[", ",", "]")
    println(s"""{"bench":"loop_profile_hits","iters":$iters,"n_nodes":$n,"checksum":${rows.head._5},"variants":$js}""")
    spark.stop()
  }
}
