package graft

import org.apache.spark.sql.functions._

import graft.functions.PermuteArray
import graft.sim.{OpqOps, PqOps}

/** Specs for the OPQ-style balanced-spread coordinate permutation:
  * the learned snake assignment against a hand-derivation, the fused
  * gather kernel's semantics (including degenerate inputs and
  * codegen/interpreted parity), permutation-invariance of the exact
  * distances, and the end-to-end permuted PQ chain. */
class OpqOpsSpec extends SparkSpec {
  import spark.implicits._

  test("learnPermutation deals dims to subspaces in snake order of " +
      "descending span") {
    // dim i spans: dim0 tiny, dim1 large, dim2 medium, dim3 zero,
    // dim4 largest, dim5 small  ->  spread order (desc, tie by dim):
    // 4, 1, 2, 5, 0, 3. Snake over m=2: r0->s0, r1->s1, r2->s1,
    // r3->s0, r4->s0, r5->s1.
    // s0 = {4, 5, 0} -> sorted {0, 4, 5}; s1 = {1, 2, 3} sorted.
    val rows = Seq(
      Seq(0.00f, 0.0f, 0.0f, 0.5f, -4.0f, 0.00f),
      Seq(0.01f, 3.0f, 1.0f, 0.5f, 4.0f, 0.05f))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val perm = OpqOps.learnPermutation(rows, "vec_id", "embedding", 2)
    assert(perm == IndexedSeq(0, 4, 5, 1, 2, 3))
  }

  test("gather kernel: permutes, nulls on degenerate input, codegen " +
      "matches interpreted") {
    val perm = IndexedSeq(2, 0, 3, 1)
    val df = Seq(
      (0L, Seq(10f, 11f, 12f, 13f)),
      (1L, null.asInstanceOf[Seq[Float]]),
      (2L, Seq(1f, 2f))).toDF("id", "v")
    val got = df.select(col("id"),
        PermuteArray.gather(col("v"), perm).as("p"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Float](1))).toMap
    assert(got(0L) == Seq(12f, 10f, 13f, 11f))
    assert(got(1L) == null)
    assert(got(2L) == null)
    // interpreted reference agrees (same path Spark takes off-codegen)
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val res = PermuteArray.evalGather(
      new GenericArrayData(Array(10f, 11f, 12f, 13f)),
      perm.toArray).asInstanceOf[GenericArrayData]
    assert(res.toFloatArray().toSeq == Seq(12f, 10f, 13f, 11f))
  }

  test("gather rejects a non-permutation") {
    intercept[IllegalArgumentException] {
      graft.functions.PermuteArrayExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge
          .expression(col("v")), IndexedSeq(0, 0, 1))
    }
  }

  test("exact quantized L1 is permutation-invariant") {
    val vecs = (0L until 10L).map { id =>
      id -> (0 until 8).map(i =>
        (((id * 13 + i * 7) % 29).toDouble / 29.0 - 0.5).toFloat)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val perm = OpqOps.learnPermutation(df, "vec_id", "embedding", 4)
    def qz(v: Seq[Float]): Seq[Long] =
      v.map(x => math.floor(x.toDouble * (1L << 20) + 0.5).toLong)
    val base = vecs.toMap
    for (a <- 0L until 10L; b <- 0L until 10L if a < b) {
      val (qa, qb) = (qz(base(a)), qz(base(b)))
      val plain = qa.zip(qb).map { case (x, y) => math.abs(x - y) }.sum
      val (pa, pb) = (perm.map(qa), perm.map(qb))
      val permuted = pa.zip(pb).map { case (x, y) => math.abs(x - y) }.sum
      assert(plain == permuted, s"pair ($a,$b)")
    }
  }

  test("opqAdcTopK matches the hand-staged chain over pre-permuted " +
      "frames") {
    val vecs = (0L until 12L).map { id =>
      id -> (0 until 8).map(i =>
        (((id * 31 + i * i * 5) % 23).toDouble / 23.0 - 0.5).toFloat)
    }.toDF("vec_id", "embedding")
    val perm = OpqOps.learnPermutation(vecs, "vec_id", "embedding", 4)
    assert(perm != (0 until 8)) // the data must actually exercise it
    val byHand = {
      val pc = OpqOps.applyPermutation(vecs, "embedding", perm)
      val m = PqOps.pqTrain(pc, "vec_id", "embedding", 4, 4, 1)
      PqOps.adcTopK(pc.filter(col("vec_id") < 2),
        PqOps.pqEncode(pc, "vec_id", "embedding", m), 3, m)
    }.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val viaOp = OpqOps.opqAdcTopK(vecs.filter(col("vec_id") < 2),
      vecs, 3, subspaces = 4, codes = 4, iters = 1)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaOp == byHand)
  }
}
