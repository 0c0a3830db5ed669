package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing probe for semDedupPq at a given SF (temporary
  * diagnostic; mirrors the operator's internal stages). */
object SemPqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    t("q87 semDedup total") {
      graft.sim.SemDedup.semDedup(emb, 0.35, numCentroids = 20)
        .count()
    }
    t("pqTrain") {
      graft.sim.PqOps.pqTrain(emb, "vec_id", "embedding",
        subspaces = 4, k = 16, iters = 1)
    }
    t("q113 semDedupPq total") {
      graft.sim.SemDedup.semDedupPq(emb, 0.35, numCentroids = 20)
        .count()
    }
    spark.stop()
  }
}
