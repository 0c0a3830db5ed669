package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The SemDeDup mega-cluster pair guard ([[SemDedup.pairKeys]]):
  * parity when no cluster blows the budget, adaptive sub-split when
  * one does, exact duplicates never separated, documented refusal on
  * geometrically inseparable piles. */
class SemDedupGuardSpec extends SparkSpec {
  import spark.implicits._

  /** Skewed corpus: `big` rows in one tight cone (one coarse cluster
    * at stride = n) plus `small` rows in an orthogonal cone. Cone
    * members spread over a quarter-circle so a seed set drawn from
    * anywhere in the cone splits it geometrically. */
  private def skewed(big: Int, small: Int): DataFrame = {
    val n = big + small
    val rows = (0 until n).map { i =>
      if (i < big) {
        val t = i.toDouble / big * (math.Pi / 4)
        (i.toLong, Seq(10.0 * math.cos(t), 10.0 * math.sin(t), 0.0, 0.0))
      } else {
        val t = (i - big).toDouble / math.max(1, small) * (math.Pi / 4)
        (i.toLong, Seq(0.0, 0.0, 10.0 * math.cos(t), 10.0 * math.sin(t)))
      }
    }
    rows.toDF("vec_id", "embedding")
  }

  private def membersOf(df: DataFrame): DataFrame =
    df.select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<double>").as("vec"))
      .withColumn("norm", sqrt(Similarity.dot(col("vec"), col("vec"))))
      .withColumn("cluster", when(element_at(col("vec"), 1) > 0.0, 0L)
        .otherwise(1L))
      .withColumn("cos_c", lit(null).cast("double"))

  test("pairKeys is the identity when every cluster fits the budget") {
    val m = membersOf(skewed(40, 10))
    val out = SemDedup.pairKeys(m, budget = 1000000L, roundScale = 6)
    // parity path: pk IS the cluster column (long), no composite keys
    assert(out.schema("pk").dataType.typeName == "long")
    assert(out.select(col("pk") === col("cluster")).collect()
      .forall(_.getBoolean(0)))
  }

  test("pairKeys sub-splits an oversize cluster under the pair budget") {
    // 800 rows in one coarse cluster = 319,600 candidate pairs;
    // budget 1000 pairs (~45 rows/key) forces at least two passes.
    val m = membersOf(skewed(800, 200))
    val out = SemDedup.pairKeys(m, budget = 1000L, roundScale = 6)
    val sizes = out.groupBy("pk").count().collect().map(_.getLong(1))
    assert(sizes.sum == 1000L) // every row keeps exactly one key
    assert(sizes.forall(n => n * (n - 1) / 2 <= 1000L),
      s"oversize key survived: ${sizes.max} rows")
    assert(sizes.length > 2) // the skew cluster actually split
  }

  test("pairKeys never separates exact duplicates") {
    // 600 spread rows plus 5 groups of 40 byte-identical vectors
    // planted at distinct cone angles; budget small enough to force
    // splitting right through the duplicate piles' size range.
    val spread = (0 until 600).map { i =>
      val t = i.toDouble / 600 * (math.Pi / 4)
      (i.toLong, Seq(10.0 * math.cos(t), 10.0 * math.sin(t), 0.0, 0.0))
    }
    val dupes = (0 until 5).flatMap { g =>
      val t = (g + 0.5) / 5 * (math.Pi / 4)
      val v = Seq(10.0 * math.cos(t), 10.0 * math.sin(t), 0.0, 0.0)
      (0 until 40).map(j => ((600 + g * 40 + j).toLong, v))
    }
    val m = membersOf((spread ++ dupes).toDF("vec_id", "embedding"))
    val out = SemDedup.pairKeys(m, budget = 2000L, roundScale = 6)
    val dupPks = out.filter(col("id") >= 600L)
      .withColumn("grp", ((col("id") - 600L) / 40L).cast("int"))
      .select("grp", "pk").distinct().collect()
      .groupBy(_.getInt(0)).view.mapValues(_.length).toMap
    assert((0 until 5).forall(g => dupPks(g) == 1),
      s"a duplicate group landed in >1 pair key: $dupPks")
  }

  test("semDedup output is invariant to an un-engaged guard") {
    val df = skewed(60, 20)
    val on  = SemDedup.semDedup(df, 0.99, centroidStride = 80L)
      .orderBy("id").collect().toSeq
    val off = SemDedup.semDedup(df, 0.99, centroidStride = 80L,
      maxPairsPerCluster = 0L).orderBy("id").collect().toSeq
    assert(on == off)
  }

  test("semDedup and semDedupPq agree under an engaged guard") {
    // Guard engages on the 400-row cone; both variants must see the
    // SAME refined pair keys and hence produce identical outputs
    // (the PQ prefilter is exact-recall within a key by construction).
    val df = skewed(400, 100)
    val exact = SemDedup.semDedup(df, 0.999, centroidStride = 500L,
      maxPairsPerCluster = 500L).orderBy("id").collect().toSeq
    val pq = SemDedup.semDedupPq(df, 0.999, centroidStride = 500L,
      maxPairsPerCluster = 500L, pqSubspaces = 2, pqCodes = 8)
      .orderBy("id").collect().toSeq
    assert(exact == pq)
    // dedup actually happened inside refined keys (adjacent cone
    // members at 0.999 rounded cosine collapse)
    assert(exact.count(_.getBoolean(5)) < exact.size)
  }

  test("property: over random corpora the guard's two theorems hold " +
      "— budget compliance and keep-set containment") {
    // deterministic pseudo-random corpora: mixed cones, planted
    // exact-duplicate piles, a zero vector — the guard must (a)
    // leave no pair key over budget, (b) never lose a guard-off
    // exemplar (splitting refines components; the argmin of a
    // component is the argmin of its sub-component).
    for (trial <- 0 until 6) {
      val rnd = new scala.util.Random(1000 + trial)
      val n = 80 + rnd.nextInt(60)
      val rows = (0 until n).map { i =>
        val r = rnd.nextInt(10)
        val v =
          if (r == 0) Seq(0.0, 0.0, 0.0, 0.0)
          else if (r <= 2) Seq(3.0, 4.0, 0.0, 0.0) // duplicate pile
          else {
            val t = rnd.nextDouble() * (math.Pi / 4)
            val axis = rnd.nextInt(2)
            if (axis == 0)
              Seq(10 * math.cos(t), 10 * math.sin(t), 0.0, 0.0)
            else Seq(0.0, 0.0, 10 * math.cos(t), 10 * math.sin(t))
          }
        (i.toLong, v)
      }
      val df = rows.toDF("vec_id", "embedding")
      val budget = 50L + rnd.nextInt(200)
      // identical-vector piles are inseparable BY DESIGN — a pile
      // whose own pair count exceeds the budget must REFUSE (the
      // documented contract: exact-dedup upstream); otherwise the
      // two theorems must hold.
      val maxPile = rows.groupBy(_._2).valuesIterator.map(_.size).max
      val pileOver = maxPile.toLong * (maxPile - 1) / 2 > budget
      val m = membersOf(df)
      try {
        // (a) budget compliance on the refined keys
        val keyed = SemDedup.pairKeys(m, budget, roundScale = 6)
        val over = keyed.groupBy("pk").count()
          .filter(col("count") * (col("count") - 1) / 2 > budget).count()
        assert(over == 0L, s"trial $trial: $over keys over budget $budget")
        // (b) containment end-to-end at a merging threshold
        val kOn = SemDedup.semDedup(df, 0.995, centroidStride = n.toLong,
            maxPairsPerCluster = budget)
          .filter(col("keep")).select("id").collect()
          .map(_.getLong(0)).toSet
        val kOff = SemDedup.semDedup(df, 0.995, centroidStride = n.toLong,
            maxPairsPerCluster = 0L)
          .filter(col("keep")).select("id").collect()
          .map(_.getLong(0)).toSet
        assert((kOff -- kOn).isEmpty,
          s"trial $trial: containment violated ${(kOff -- kOn).take(5)}")
      } catch {
        case e: IllegalStateException =>
          assert(pileOver,
            s"trial $trial: refused (${e.getMessage.take(80)}) but no " +
            s"duplicate pile exceeds budget $budget (max pile $maxPile)")
      }
    }
  }

  test("SDC bound admissibility: sdcDot sandwiches the true dot, and " +
      "the lower-bound 'sure' test never admits a sub-threshold pair") {
    // The invariant BOTH pqPairs tests rest on (upper admit = exact
    // recall; lower sure = rescore skip, VERDICT r18 #5):
    //   |dot(a,b) − sdcDot| ≤ Q,  Q = rn_a·e_b + e_a·rn_b + e_a·e_b
    // checked literally over every pair of a random corpus, plus the
    // implication: sure(thr) ⇒ rounded cosine ≥ thr for a threshold
    // ladder.
    val rnd = new scala.util.Random(7)
    val rows = (0 until 60).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextDouble() * 4 - 2)))
    val df = rows.toDF("vec_id", "embedding")
    val model = PqOps.pqTrain(df, "vec_id", "embedding",
      subspaces = 2, k = 4, iters = 1)
    val scale = (1L << model.scaleBits).toDouble
    val off = 1L << (model.scaleBits + 1)
    val reconD = model.codebook.map(_.map(_.map(c => (c - off) / scale)))
    val meta = PqOps.withPqMeta(
        df.select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("vec")),
        "vec", model)
      .select("id", "__codes", "__pqerr", "__pqnorm").collect()
      .map(r => r.getLong(0) ->
        ((r.getSeq[Int](1), r.getDouble(2), r.getDouble(3))))
      .toMap
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val vecOf = rows.toMap
    val p = 1e6
    val thrs = Seq(-0.5, 0.0, 0.35, 0.9, 0.99)
    for {
      (ia, _) <- rows; (ib, _) <- rows if ia < ib
    } {
      val (ca, ea, ra) = meta(ia); val (cb, eb, rb) = meta(ib)
      val sdc = (0 until model.subspaces).map(s =>
        dot(reconD(s)(ca(s)).toSeq, reconD(s)(cb(s)).toSeq)).sum
      val q = ra * eb + ea * rb + ea * eb
      val t = dot(vecOf(ia), vecOf(ib))
      assert(sdc - q - 1e-9 <= t && t <= sdc + q + 1e-9,
        s"pair ($ia,$ib): dot $t outside [${sdc - q}, ${sdc + q}]")
      val na = math.sqrt(dot(vecOf(ia), vecOf(ia)))
      val nb = math.sqrt(dot(vecOf(ib), vecOf(ib)))
      val rcos = math.floor(t / (na * nb) * p + 0.5) / p
      for (thr <- thrs) {
        val sure = sdc - q * (1.0 + 1e-12) >=
          (thr + 0.5 / p + 1e-9) * na * nb
        assert(!sure || rcos >= thr,
          s"pair ($ia,$ib) thr $thr: sure but rcos $rcos < thr")
      }
    }
  }

  test("pairKeys refuses a geometrically inseparable mega-pile") {
    val v = Seq(3.0, 4.0, 0.0, 0.0)
    val m = membersOf((0 until 100).map(i => (i.toLong, v))
      .toDF("vec_id", "embedding"))
    val ex = intercept[IllegalStateException] {
      SemDedup.pairKeys(m, budget = 10L, roundScale = 6, maxDepth = 2)
        .count()
    }
    assert(ex.getMessage.contains("exact dedup"))
  }
}
