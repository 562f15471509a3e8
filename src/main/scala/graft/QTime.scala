package graft
import org.apache.spark.sql.SparkSession
object QTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- args; i <- 1 to 2) {
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, "/root/testdata/sf0.1").count()
      println(f"[qtime] $n run$i rows=$c ${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    spark.stop()
  }
}
