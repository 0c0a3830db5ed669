package graft.sim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Band census for the SDC pair stage's lower-bound rescore skip
  * (VERDICT r18 ask #5): at a given SF, reproduces q113's candidate
  * sliver and reports how many admitted pairs are `sure` (lower
  * bound clears the threshold — rescore skipped) vs uncertain
  * (exact rescore paid). Lives in `graft.sim` for `private[sim]`
  * access to the pair-stage internals; measurement-only. */
object SemLbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mSub = args.lift(1).map(_.toInt).getOrElse(4)
    val kCodes = args.lift(2).map(_.toInt).getOrElse(16)
    val threshold = 0.35
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val p = 1e6
    val model = PqOps.pqTrain(emb, "vec_id", "embedding",
      subspaces = mSub, k = kCodes, iters = 1)
    val scale = (1L << model.scaleBits).toDouble
    val off = 1L << (model.scaleBits + 1)
    val reconD = model.codebook.map(_.map(_.map(c => (c - off) / scale)))
    val m = model.subspaces
    val tbl = Array.tabulate(m, model.codes, model.codes) { (s, ja, jb) =>
      val a = reconD(s)(ja); val b = reconD(s)(jb)
      var d = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); i += 1 }
      d
    }
    val tblLit = array(tbl.map(sb => array(sb.map(row =>
      array(row.map(lit).toIndexedSeq: _*)).toIndexedSeq: _*))
      .toIndexedSeq: _*)
    val n = emb.count()
    val stride = math.max(1L, n / 20)
    val centRows = emb.filter(pmod(col("vec_id"), lit(stride)) === 0)
      .select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>")).collect()
    val cIds = centRows.map(_.getLong(0)).toSeq
    val cVecs = centRows.map(_.getSeq[Double](1)).toSeq
    val members = emb.select(col("vec_id").cast("long").as("id"),
        col("embedding").as("vec"))
      .withColumn("norm", sqrt(Similarity.dot(col("vec"), col("vec"))))
      .withColumn("pk", element_at(
        graft.functions.NearestCentroids.topIds(col("vec"), cIds, cVecs,
          1, 6), 1))
    val slim = PqOps.withPqMeta(members, "vec", model)
      .select(col("pk"), col("id"), col("norm"),
        col("__codes"), col("__pqerr"), col("__pqnorm"))
      .localCheckpoint(eager = true)
    val a = slim.select(col("pk"), col("id").as("id_a"),
      col("norm").as("na"), col("__codes").as("ca"),
      col("__pqerr").as("ea"), col("__pqnorm").as("ra"))
    val b = slim.select(col("pk"), col("id").as("id_b"),
      col("norm").as("nb"), col("__codes").as("cb"),
      col("__pqerr").as("eb"), col("__pqnorm").as("rb"))
    val sdcDot = (0 until m).map { s =>
      element_at(element_at(element_at(tblLit, s + 1),
        element_at(col("ca"), s + 1) + 1),
        element_at(col("cb"), s + 1) + 1)
    }.reduce(_ + _)
    val qBound = (col("ra") * col("eb") + col("ea") * col("rb") +
      col("ea") * col("eb")) * lit(1.0 + 1e-12)
    val margin = qBound +
      (lit(0.5 / p) + lit(1e-9)) * col("na") * col("nb")
    val census = a.join(b.hint("merge"), Seq("pk"))
      .filter(col("id_a") < col("id_b"))
      .select(
        (col("na") > 0.0 && col("nb") > 0.0 &&
          (sdcDot + margin) / (col("na") * col("nb")) >= threshold)
          .as("admit"),
        (sdcDot - qBound >= (lit(threshold) + lit(0.5 / p) +
          lit(1e-9)) * col("na") * col("nb")).as("sure"))
      .agg(count(lit(1)).as("all_pairs"),
        sum(when(col("admit"), 1L).otherwise(0L)).as("admitted"),
        sum(when(col("admit") && col("sure"), 1L).otherwise(0L))
          .as("sure_skip"),
        sum(when(col("admit") && !col("sure"), 1L).otherwise(0L))
          .as("uncertain_rescore"))
      .collect()(0)
    println(s"[probe] sf=$dir m=$mSub k=$kCodes pairs=${census.getLong(0)} " +
      s"admitted=${census.getLong(1)} sure=${census.getLong(2)} " +
      s"uncertain=${census.getLong(3)}")
    spark.stop()
  }
}
