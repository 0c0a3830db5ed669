package graft

import org.apache.spark.sql.functions._

import graft.sim.PqOps

/** Direct specs for product quantization: codebook training against a
  * literal re-derivation, encode/search determinism under
  * repartitioning, ADC exactness in the k=n limit, and the IVFADC
  * composition's agreement with flat ADC when every list is probed. */
class PqOpsSpec extends SparkSpec {
  import spark.implicits._

  private def quant(v: Seq[Double], bits: Int): Array[Long] = {
    val scale = (1L << bits).toDouble
    val off = 1L << (bits + 1)
    v.map(x => math.floor(x * scale + 0.5).toLong + off).toArray
  }

  private def l1(a: Array[Long], b: Array[Long]): Long =
    a.indices.map(i => math.abs(a(i) - b(i))).sum

  /** Literal single-threaded PQ trainer with identical semantics. */
  private def pqBrute(vecs: Seq[(Long, Seq[Double])], m: Int, k: Int,
      iters: Int, bits: Int): Array[Array[Array[Long]]] = {
    val q = vecs.sortBy(_._1).map { case (id, v) => id -> quant(v, bits) }
    val d = q.head._2.length; val dsub = d / m
    var cb = Array.tabulate(m, k)((s, j) =>
      q(j)._2.slice(s * dsub, (s + 1) * dsub))
    def code(s: Int, sv: Array[Long]): Int =
      cb(s).zipWithIndex.minBy { case (c, j) => (l1(c, sv), j) }._2
    for (_ <- 1 to iters) {
      cb = Array.tabulate(m, k) { (s, j) =>
        val members = q.map(_._2.slice(s * dsub, (s + 1) * dsub))
          .filter(sv => code(s, sv) == j)
        if (members.isEmpty) cb(s)(j)
        else Array.tabulate(dsub) { i =>
          val sm = members.map(_(i)).sum; val n = members.size.toLong
          (2 * sm + n) / (2 * n)
        }
      }
    }
    cb
  }

  private val vecs: Seq[(Long, Seq[Double])] = Seq(
    0L -> Seq(0.9, 0.0, 0.1, 0.8), 1L -> Seq(0.8, 0.1, 0.0, 0.9),
    2L -> Seq(-0.9, 0.0, 0.0, -0.7), 3L -> Seq(-0.8, -0.1, 0.1, -0.9),
    4L -> Seq(0.0, 0.9, -0.1, 0.1), 5L -> Seq(0.1, 0.8, 0.0, 0.0),
    6L -> Seq(0.0, 0.85, 0.05, 0.1), 7L -> Seq(0.45, 0.45, 0.0, 0.5))
  private def df = vecs.map { case (id, v) => (id, v.map(_.toFloat)) }
    .toDF("vec_id", "embedding")

  test("pqTrain matches literal re-derivation; encode partition-invariant") {
    // k=4 over 2 subspaces of 2 dims; 3 Lloyd rounds, some codes go
    // empty in some subspaces and must retain their previous centroid.
    val want = pqBrute(vecs, 2, 4, 3, 20)
    val model = PqOps.pqTrain(df, "vec_id", "embedding",
      subspaces = 2, k = 4, iters = 3)
    assert(model.codebook.map(_.map(_.toSeq).toSeq).toSeq ==
      want.map(_.map(_.toSeq).toSeq).toSeq)
    val enc = PqOps.pqEncode(df, "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val enc5 = PqOps.pqEncode(df.repartition(5), "vec_id", "embedding",
      model).collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(enc == enc5)
    // codes re-derived literally
    val dsub = 2
    vecs.foreach { case (id, v) =>
      val qv = quant(v, 20)
      val wantCodes = (0 until 2).map { s =>
        val sv = qv.slice(s * dsub, (s + 1) * dsub)
        want(s).zipWithIndex.minBy { case (c, j) => (l1(c, sv), j) }._2
      }
      assert(enc(id) == wantCodes, s"id=$id")
    }
  }

  test("ADC is exact when every vector is its own centroid (k=n, iters=1)") {
    // With k = n and one Lloyd round each code converges to (or stays
    // at) a singleton centroid equal to a quantized vector, so the
    // looked-up distance equals the exact micro-unit L1.
    val model = PqOps.pqTrain(df, "vec_id", "embedding",
      subspaces = 2, k = vecs.size, iters = 1)
    val enc = PqOps.pqEncode(df, "vec_id", "embedding", model)
    val got = PqOps.adcTopK(df.filter(col("vec_id") < 2), enc, 3, model)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val q = vecs.map { case (id, v) => id -> quant(v, 20) }.toMap
    for (qid <- Seq(0L, 1L)) {
      val exact = vecs.map(_._1).filter(_ != qid)
        .map(n => n -> l1(q(qid), q(n))).sortBy { case (n, d) => (d, n) }
      (1 to 3).foreach { r =>
        assert(got((qid, r)) == exact(r - 1), s"q=$qid rank=$r")
      }
    }
  }

  test("argmin ties break to the smallest code index") {
    // Two identical seed vectors produce duplicate centroids; every
    // encode must pick the lower code.
    val dup = Seq((0L, Seq(0.5f, 0.5f)), (1L, Seq(0.5f, 0.5f)),
      (2L, Seq(0.4f, 0.6f))).toDF("vec_id", "embedding")
    val model = PqOps.pqTrain(dup, "vec_id", "embedding",
      subspaces = 1, k = 2, iters = 0)
    val codes = PqOps.pqEncode(dup, "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).head).toMap
    assert(codes(0L) == 0 && codes(1L) == 0)
  }

  test("NearestListsL1 kernel matches the relational array_sort form") {
    import graft.functions.NearestListsL1
    val rng = new scala.util.Random(7)
    val dim = 16
    val cents: Seq[Seq[Long]] = Seq.tabulate(9)(j =>
      Seq.tabulate(dim)(i => 2097152L + rng.nextInt(4096) - 2048 + j))
    val rows = (0L until 200L).map { id =>
      // include exact centroid copies (tie pressure) and duplicates
      if (id < 9) (id, cents(id.toInt))
      else (id, Seq.tabulate(dim)(_ => 2097152L + rng.nextInt(8192) - 4096))
    }
    val df = rows.toDF("id", "qv")
    for (n <- Seq(1, 3, 9, 12)) {
      val relational = slice(transform(array_sort(
        zip_with(
          array(cents.map(c => array(c.map(lit): _*)): _*),
          sequence(lit(0), lit(cents.length - 1)),
          (c, i) => struct(
            aggregate(zip_with(col("qv"), c, (a, b) => abs(a - b)),
              lit(0L), (acc, x) => acc + x).as("d"), i.as("i")))),
        e => e.getField("i")), 1, n)
      val got = df.select(col("id"),
          NearestListsL1.topIdx(col("qv"), cents, n).as("k"),
          relational.as("r"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"id=${r.getLong(0)} n=$n")
      }
    }
  }

  test("farthestSeed beats the id seed on clustered data") {
    // Three tight clusters; the 4 smallest ids all sit in cluster A,
    // so the plain id seed wastes all 4 inits there. The farthest-
    // point sweep must cover every cluster, giving strictly lower
    // total quantization error (sum of min-L1 to the chosen seeds).
    def v(base: Long, jit: Long) = Array(base, base, base, base + jit)
    val pool = Array(
      v(1000000L, 0), v(1000000L, 5), v(1000000L, -3), v(1000000L, 9),
      v(5000000L, 2), v(5000000L, -4), v(9000000L, 1), v(9000000L, 7))
    val far = PqOps.farthestSeed(pool, 3)
    def qerr(seeds: Array[Array[Long]]) = pool.map(p =>
      seeds.map(s => p.indices.map(i => math.abs(p(i) - s(i))).sum)
        .min).sum
    assert(qerr(far) < qerr(pool.take(3)))
    // covers all three clusters
    assert(far.map(_.head).toSet == Set(1000000L, 5000000L, 9000000L))
    // deterministic and first pick = smallest id
    assert(PqOps.farthestSeed(pool, 3).map(_.toSeq).toSeq ==
      far.map(_.toSeq).toSeq)
    assert(far.head.sameElements(pool.head))
    // end-to-end: pqTrain(seedPool) is partition-invariant
    val m1 = PqOps.pqTrain(df, "vec_id", "embedding",
      subspaces = 2, k = 3, iters = 1, seedPool = 8)
    val m2 = PqOps.pqTrain(df.repartition(5), "vec_id", "embedding",
      subspaces = 2, k = 3, iters = 1, seedPool = 8)
    assert(m1.codebook.map(_.map(_.toSeq).toSeq).toSeq ==
      m2.codebook.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("residual IVFADC is exact when codes=n and every list is probed") {
    // With one code per row (codes = n, one Lloyd round) each
    // residual is its own centroid, so the looked-up distance is
    // L1(q - c_list, n - c_list) = L1(q, n) exactly — the residual
    // analog of the flat-ADC k=n exactness check.
    val queries = df.filter(col("vec_id") < 2)
    val got = PqOps.ivfPqTopKResidual(queries, df, 3,
        subspaces = 2, codes = vecs.size, iters = 1, nProbe = 4,
        centroidStride = 2L)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val q = vecs.map { case (id, v) => id -> quant(v, 20) }.toMap
    for (qid <- Seq(0L, 1L)) {
      val exact = vecs.map(_._1).filter(_ != qid)
        .map(n => n -> l1(q(qid), q(n))).sortBy { case (n, d) => (d, n) }
      (1 to 3).foreach { r =>
        assert(got((qid, r)) == exact(r - 1), s"q=$qid rank=$r")
      }
    }
  }

  test("adcRerankTopK with a full shortlist equals exact L1 top-k") {
    // shortlist = every candidate (n−1 after self-exclusion), so the
    // rerank stage sees the whole corpus and must return the exact
    // integer-L1 ranking regardless of how lossy the codes are.
    val model = PqOps.pqTrain(df, "vec_id", "embedding",
      subspaces = 2, k = 2, iters = 0) // deliberately coarse codes
    val enc = PqOps.pqEncode(df, "vec_id", "embedding", model)
    val got = PqOps.adcRerankTopK(df.filter(col("vec_id") < 2), df,
        enc, k = 3, shortlist = vecs.size - 1, model)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val q = vecs.map { case (id, v) => id -> quant(v, 20) }.toMap
    for (qid <- Seq(0L, 1L)) {
      val exact = vecs.map(_._1).filter(_ != qid)
        .map(n => n -> l1(q(qid), q(n))).sortBy { case (n, d) => (d, n) }
      (1 to 3).foreach { r =>
        assert(got((qid, r)) == exact(r - 1), s"q=$qid rank=$r")
      }
    }
  }

  test("recallAtK: exact micro-unit recall; approx-only queries drop") {
    import graft.sim.EvalOps
    val approx = Seq((1L, 10L), (1L, 11L), (2L, 20L), (3L, 99L))
      .toDF("q_id", "n_id")
    val truth = Seq((1L, 10L), (1L, 12L), (2L, 20L), (2L, 21L),
      (4L, 40L)).toDF("q_id", "n_id")
    val got = EvalOps.recallAtK(approx, truth).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    // q1: 1 of 2 hit; q2: 1 of 2; q4: truth but no approx -> 0;
    // q3: approx only, no truth row
    assert(got == Map(1L -> (1L, 2L, 500000L), 2L -> (1L, 2L, 500000L),
      4L -> (0L, 1L, 0L)))
  }

  test("Lloyd-refined coarse lists: all-probed still equals flat " +
      "ADC, and the refined centroid is the literal half-up mean") {
    val model = PqOps.pqTrain(df, "vec_id", "embedding",
      subspaces = 2, k = 4, iters = 2)
    val enc = PqOps.pqEncode(df, "vec_id", "embedding", model)
    val queries = df.filter(col("vec_id") < 3)
    val flat = PqOps.adcTopK(queries, enc, 4, model)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    // refinement moves the lists but all-probed search must still
    // cover everything and rank identically to flat ADC
    val ivf = PqOps.ivfPqTopK(queries, df, 4, model, nProbe = 4,
        centroidStride = 2L, coarseIters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(ivf == flat)
    // literal re-derivation of one round on a tiny frame: seeds at
    // ids 0 and 2 (stride 2); with vectors clustered around the
    // seeds, the refined centroid is the per-dim (2s+n) div (2n)
    // half-up mean of each list's members
    def qz(v: Seq[Double]): Array[Long] =
      v.map(x => math.floor(x * (1L << 20) + 0.5).toLong +
        (1L << 21)).toArray
    val tiny = Seq(
      0L -> Seq(0.0, 0.0), 1L -> Seq(0.1, 0.1),
      2L -> Seq(1.0, 1.0), 3L -> Seq(0.9, 0.9))
      .map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val qcorp = tiny.select(col("vec_id").as("id"),
      PqOps.quantize(col("embedding"), 20).as("qv"))
    val got = PqOps.coarseCentroids(qcorp, stride = 2L, coarseIters = 1)
    val members = Seq(Seq(qz(Seq(0.0, 0.0)), qz(Seq(0.1, 0.1))),
      Seq(qz(Seq(1.0, 1.0)), qz(Seq(0.9, 0.9))))
    val want = members.map { ms =>
      Array.tabulate(2) { i =>
        val s = ms.map(_(i)).sum; val n = ms.length.toLong
        (2L * s + n) / (2L * n)
      }
    }
    assert(got.map(_.toSeq).toSeq == want.map(_.toSeq))
    // an empty list keeps its seed: duplicate seed vectors tie every
    // assignment to the smaller index, so list 1 is empty and its
    // centroid must survive the round verbatim
    val lop = Seq(0L -> Seq(0.5, 0.5), 1L -> Seq(0.4, 0.6),
      2L -> Seq(0.5, 0.5), 3L -> Seq(0.7, 0.4))
      .map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val qlop = lop.select(col("vec_id").as("id"),
      PqOps.quantize(col("embedding"), 20).as("qv"))
    val seeds = PqOps.coarseCentroids(qlop, 2L, 0)
    assert(seeds(0).toSeq == seeds(1).toSeq) // ids 0 and 2 duplicate
    val ref = PqOps.coarseCentroids(qlop, 2L, 1)
    assert(ref(1).toSeq == seeds(1).toSeq, "empty list lost its seed")
    assert(ref(0).toSeq != seeds(0).toSeq) // list 0 absorbed everyone
  }

  test("ivfPqTopK with all lists probed equals flat ADC top-k") {
    val model = PqOps.pqTrain(df, "vec_id", "embedding",
      subspaces = 2, k = 4, iters = 2)
    val enc = PqOps.pqEncode(df, "vec_id", "embedding", model)
    val queries = df.filter(col("vec_id") < 3)
    val flat = PqOps.adcTopK(queries, enc, 4, model)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    // stride 2 -> centroids at ids 0,2,4,6 (4 lists); probe all 4
    val ivf = PqOps.ivfPqTopK(queries, df, 4, model, nProbe = 4,
        centroidStride = 2L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(ivf == flat)
    // nProbe=1 returns a subset of candidates, still correctly ranked
    val one = PqOps.ivfPqTopK(queries, df, 4, model, nProbe = 1,
      centroidStride = 2L).collect()
    one.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ranked = rows.sortBy(_.getInt(1))
        .map(r => (r.getLong(3), r.getLong(2)))
      assert(ranked.sameElements(ranked.sorted))
    }
  }

  /** Sequential farthest-point reference with identical semantics. */
  private def fpsBrute(q: Seq[(Long, Array[Long])], c: Int,
      batch: Int): Seq[Seq[Long]] = {
    val sorted = q.sortBy(_._1)
    var seeds = Vector(sorted.head._2)
    var done = false
    while (!done && seeds.length < c) {
      val b = math.min(batch, c - seeds.length)
      val picked = sorted
        .map { case (id, v) => (seeds.map(s => l1(s, v)).min, id, v) }
        .filter(_._1 > 0)
        .sortBy { case (d, id, _) => (-d, id) }
        .take(b)
      if (picked.isEmpty) done = true
      else seeds ++= picked.map(_._3)
    }
    seeds.map(_.toSeq)
  }

  test("farthestPointSeeds matches the sequential reference, is " +
      "partition-invariant, batches against the pre-round set, and " +
      "stops early on duplicate exhaustion") {
    val rng = new scala.util.Random(41)
    val randVecs = (0L until 40L).map(id =>
      id -> Seq.fill(4)(rng.nextDouble() * 2 - 1))
    val qcorp = randVecs.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id").as("id"),
        PqOps.quantize(col("embedding"), 20).as("qv"))
    val quantized = randVecs.map { case (id, v) => id -> quant(v, 20) }
    for (c <- Seq(1, 3, 7); b <- Seq(1, 3)) {
      val want = fpsBrute(quantized, c, b)
      val got = PqOps.farthestPointSeeds(qcorp, c, b)
      assert(got.map(_.toSeq).toSeq == want, s"c=$c batch=$b")
      val gotRep = PqOps.farthestPointSeeds(qcorp.repartition(7), c, b)
      assert(gotRep.map(_.toSeq).toSeq == want, s"repart c=$c batch=$b")
    }
    // duplicate exhaustion: 3 distinct vectors among 6 rows can
    // yield at most 3 seeds however many are asked for
    val dup = Seq(0L -> Seq(0.1, 0.2), 1L -> Seq(0.1, 0.2),
      2L -> Seq(0.9, -0.5), 3L -> Seq(0.9, -0.5),
      4L -> Seq(-0.4, 0.4), 5L -> Seq(-0.4, 0.4))
      .map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id").as("id"),
        PqOps.quantize(col("embedding"), 20).as("qv"))
    val capped = PqOps.farthestPointSeeds(dup, 10)
    assert(capped.length == 3)
    assert(capped.map(_.toSeq).distinct.length == 3)
  }

  test("MinDistL1 kernel: exact min over the seed set; null element, " +
      "null array, and length mismatch all yield NULL") {
    val seeds = Seq(Seq(10L, 20L, 30L), Seq(100L, 0L, 50L))
    val rows = spark.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, Seq[Any](11L, 18L, 33L)),
      org.apache.spark.sql.Row(2L, Seq[Any](99L, 2L, 50L)),
      org.apache.spark.sql.Row(3L, Seq[Any](1L, null, 3L)),
      org.apache.spark.sql.Row(4L, null),
      org.apache.spark.sql.Row(5L, Seq[Any](7L, 7L))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("qv",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)))))
    val got = rows.select(col("id"),
        graft.functions.MinDistL1.minDist(col("qv"), seeds).as("d"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    // id 1: min(1+2+3, 89+18+17) = 6; id 2: min(89+18+20, 1+2+0) = 3
    assert(got(1L) == 6L && got(2L) == 3L)
    assert(got(3L) == null && got(4L) == null && got(5L) == null)
  }

  test("ivfSqTopK with farthest seeds and all lists probed equals " +
      "flat SQ8 top-k") {
    import graft.sim.SqOps
    val model = SqOps.sqTrain(df, "vec_id", "embedding")
    val enc = SqOps.sqEncode(df, "vec_id", "embedding", model)
    val queries = df.filter(col("vec_id") < 3)
    val flat = SqOps.sqTopK(queries, enc, 4, model)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    val ivf = SqOps.ivfSqTopK(queries, df, 4, model, numCoarse = 4,
        nProbe = 4, coarseSeed = "farthest")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(ivf == flat)
  }
}
