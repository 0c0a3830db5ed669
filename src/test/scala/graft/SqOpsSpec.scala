package graft

import org.apache.spark.sql.functions._

import graft.sim.SqOps

/** Direct specs for scalar quantization (SQ8): bounds training and
  * codes against a literal re-derivation, the per-dimension error
  * bound, exactness on constant dimensions, partition invariance,
  * and the IVF composition's agreement with flat SQ when every list
  * is probed. */
class SqOpsSpec extends SparkSpec {
  import spark.implicits._

  private def quant(v: Seq[Double], bits: Int): Array[Long] = {
    val scale = (1L << bits).toDouble
    val off = 1L << (bits + 1)
    v.map(x => math.floor(x * scale + 0.5).toLong + off).toArray
  }

  /** Literal single-threaded re-derivation: bounds, codes, decode,
    * all-pairs ranking — identical integer semantics. */
  private def sqBrute(vecs: Seq[(Long, Seq[Double])], bits: Int) = {
    val q = vecs.map { case (id, v) => id -> quant(v, bits) }
    val d = q.head._2.length
    val mins = Array.tabulate(d)(i => q.map(_._2(i)).min)
    val maxs = Array.tabulate(d)(i => q.map(_._2(i)).max)
    def codes(v: Array[Long]): Array[Int] = Array.tabulate(d) { i =>
      val sp = maxs(i) - mins(i)
      if (sp == 0L) 0
      else (((v(i) - mins(i)) * 510L + sp) / (2L * sp)).toInt
    }
    def decode(c: Array[Int]): Array[Long] = Array.tabulate(d) { i =>
      val sp = maxs(i) - mins(i)
      mins(i) + (2L * c(i) * sp + 255L) / 510L
    }
    (q, mins, maxs, codes _, decode _)
  }

  private val vecs: Seq[(Long, Seq[Double])] = Seq(
    0L -> Seq(0.9, 0.0, 0.1, 0.8), 1L -> Seq(0.8, 0.1, 0.0, 0.9),
    2L -> Seq(-0.9, 0.0, 0.0, -0.7), 3L -> Seq(-0.8, -0.1, 0.1, -0.9),
    4L -> Seq(0.0, 0.9, -0.1, 0.1), 5L -> Seq(0.1, 0.8, 0.0, 0.0),
    6L -> Seq(0.0, 0.85, 0.05, 0.1), 7L -> Seq(0.45, 0.45, 0.0, 0.5))
  private def df = vecs.map { case (id, v) => (id, v.map(_.toFloat)) }
    .toDF("vec_id", "embedding")

  test("sqTrain + sqEncode match literal re-derivation; decode error bounded") {
    val (q, mins, maxs, codes, decode) = sqBrute(vecs, 20)
    val model = SqOps.sqTrain(df, "vec_id", "embedding")
    assert(model.mins.toSeq == mins.toSeq)
    assert(model.maxs.toSeq == maxs.toSeq)
    val got = SqOps.sqEncode(df, "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    q.foreach { case (id, v) =>
      assert(got(id).toSeq == codes(v).toSeq, s"codes for $id")
      // per-dimension reconstruction error <= half a code step (+1
      // for the two roundings): |decode(code(v)) - v| <= span/510 + 1
      val rec = decode(codes(v))
      v.indices.foreach { i =>
        val sp = maxs(i) - mins(i)
        assert(math.abs(rec(i) - v(i)) <= sp / 510L + 1L,
          s"dim $i of $id: ${rec(i)} vs ${v(i)} (span $sp)")
      }
    }
    // codes are one byte by construction
    got.values.foreach(_.foreach(c => assert(c >= 0 && c <= 255)))
  }

  test("constant dimensions encode 0 and decode exactly") {
    val const = Seq(0L -> Seq(0.5, 1.0), 1L -> Seq(0.5, -1.0),
      2L -> Seq(0.5, 0.0))
    val cdf = const.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val model = SqOps.sqTrain(cdf, "vec_id", "embedding")
    assert(model.span(0) == 0L)
    val enc = SqOps.sqEncode(cdf, "vec_id", "embedding", model)
      .collect().map(_.getSeq[Int](1))
    enc.foreach(c => assert(c.head == 0))
    // flat search over a constant dim contributes 0 to every distance
    val encDf = SqOps.sqEncode(cdf, "vec_id", "embedding", model)
    val top = SqOps.sqTopK(cdf.filter(col("vec_id") === 0), encDf, 2, model)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(top.length == 2)
  }

  test("sqTopK matches literal all-pairs ranking; partition-invariant") {
    val (q, _, _, codes, decode) = sqBrute(vecs, 20)
    val model = SqOps.sqTrain(df, "vec_id", "embedding")
    val want = (for {
      (qid, qv) <- q if qid < 3
      (nid, nv) <- q if nid != qid
    } yield {
      val rec = decode(codes(nv))
      (qid, nid, qv.indices.map(i => math.abs(qv(i) - rec(i))).sum)
    }).groupBy(_._1).flatMap { case (qid, rows) =>
      rows.sortBy(r => (r._3, r._2)).take(3).zipWithIndex
        .map { case ((_, nid, d), r) => (qid, r + 1, nid, d) }
    }.toSet
    Seq(1, 7).foreach { parts =>
      val enc = SqOps.sqEncode(df.repartition(parts), "vec_id",
        "embedding", model)
      val got = SqOps.sqTopK(df.filter(col("vec_id") < 3), enc, 3, model)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == want, s"parts=$parts")
    }
  }

  test("d=768 stays inside whole-stage codegen (no 64KB fallback) " +
      "and matches the literal re-derivation") {
    // Production embedding dims were the r14 escape hatch: the
    // unrolled element_at chains generated d-term methods that cross
    // the JVM 64KB limit around d ~ 500 and silently fall back to
    // interpreted evaluation. The fused kernels generate
    // constant-size loops; with fallback DISABLED a compile failure
    // would throw here instead of degrading.
    val d = 768
    // values float-rounded up front so the literal re-derivation
    // quantizes exactly what the engine reads from the FloatType col
    val big: Seq[(Long, Seq[Double])] = (0L until 24L).map { id =>
      id -> (0 until d).map(i =>
        (((id * 31 + i * 17) % 97).toDouble / 97.0 - 0.5)
          .toFloat.toDouble)
    }
    val bigDf = big.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val prevWS = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val (q, mins, maxs, codes, decode) = sqBrute(big, 20)
      val model = SqOps.sqTrain(bigDf, "vec_id", "embedding")
      assert(model.mins.toSeq == mins.toSeq)
      assert(model.maxs.toSeq == maxs.toSeq)
      val enc = SqOps.sqEncode(bigDf, "vec_id", "embedding", model)
      val top = SqOps.sqTopK(bigDf.filter(col("vec_id") < 2), enc, 3,
        model)
      val want = (for {
        (qid, qv) <- q if qid < 2
        (nid, nv) <- q if nid != qid
      } yield {
        val rec = decode(codes(nv))
        (qid, nid, qv.indices.map(i => math.abs(qv(i) - rec(i))).sum)
      }).groupBy(_._1).flatMap { case (qid, rows) =>
        rows.sortBy(r => (r._3, r._2)).take(3).zipWithIndex
          .map { case ((_, nid, dd), r) => (qid, r + 1, nid, dd) }
      }.toSet
      val got = top.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == want)
      // post-execution (AQE-final) plan: the scoring projection must
      // sit inside a whole-stage-codegen span — the tree string marks
      // codegen'd operators with a "*(n)" prefix
      val plan = top.queryExecution.executedPlan.toString
      assert("""\*\(\d+\) Project \[q_id[^\n]*sq_l1_dist""".r
          .findFirstIn(plan).nonEmpty,
        s"scoring projection not codegen'd:\n$plan")
    } finally spark.conf.set("spark.sql.codegen.fallback", prevWS)
  }

  test("degenerate rows (null vector, ragged length) score null and " +
      "never rank above real candidates") {
    val model = SqOps.sqTrain(df, "vec_id", "embedding")
    val withBad = df.unionAll(Seq(
        (100L, null.asInstanceOf[Seq[Float]]),
        (101L, Seq(0.1f, 0.2f))) // ragged: d=2 vs model d=4
      .toDF("vec_id", "embedding"))
    val enc = SqOps.sqEncode(withBad, "vec_id", "embedding", model)
    val badCodes = enc.filter(col("vec_id") >= 100L)
      .collect().map(r => r.isNullAt(1))
    assert(badCodes.toSeq == Seq(true, true))
    val top = SqOps.sqTopK(df.filter(col("vec_id") === 0), enc,
        withBad.count().toInt, model)
      .collect().map(r => (r.getLong(2), if (r.isNullAt(3)) None
        else Some(r.getLong(3))))
    // null-adist candidates exist but sort AFTER every real distance
    assert(top.count(_._2.isEmpty) == 2)
    assert(top.takeWhile(_._2.nonEmpty).length == top.length - 2)
  }

  test("ivfSqTopK with all lists probed equals flat SQ top-k") {
    val model = SqOps.sqTrain(df, "vec_id", "embedding")
    val enc = SqOps.sqEncode(df, "vec_id", "embedding", model)
    val queries = df.filter(col("vec_id") < 3)
    val flat = SqOps.sqTopK(queries, enc, 3, model).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    // stride 1 -> every vector is a centroid; nProbe = n lists
    val ivf = SqOps.ivfSqTopK(queries, df, 3, model,
        nProbe = vecs.length, centroidStride = 1L).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(ivf == flat)
  }
}
