package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.text.{InterleaveOps, SampleOps}

/** Property-based invariants for the round-15 ordering/splitting
  * substrate: randomized parity against driver-side sequential
  * references (the same adversarial style as [[PropertySpec]]). */
class MixPropertySpec extends SparkSpec {
  import spark.implicits._

  private def holds(p: Prop, n: Int): Boolean =
    SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n), p).passed

  /** [[SampleOps.hashCoord]] replicated on the driver. */
  private def coord(salt: String, id: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt:$id".getBytes("UTF-8"))
    java.lang.Long.parseLong(
      md.map("%02x".format(_)).mkString.take(8), 16).toDouble /
      4294967296.0
  }

  private def gcd(a: Long, b: Long): Long = {
    var x = a; var y = b
    while (y != 0) { val t = x % y; x = y; y = t }
    math.max(x, 1L)
  }
  private def lcmCap(xs: Seq[Long], cap: Long): Long = {
    var acc = 1L
    xs.foreach { d =>
      val m = d / gcd(acc, d)
      if (m != 0 && acc > cap / m) return cap
      acc *= m
    }
    acc
  }

  test("byTokens interleave == sequential WFQ reference on random " +
      "weights/sizes (keys, ranks, and the total order)") {
    val genRows = Gen.nonEmptyListOf(for {
      s <- Gen.oneOf("a", "b", "c")
      sz <- Gen.choose(0L, 20L)
    } yield (s, sz)).map(_.zipWithIndex.map { case ((s, sz), i) =>
      (i.toLong, s, sz) })
    val genW = for {
      wa <- Gen.choose(1L, 7L); wb <- Gen.choose(1L, 7L)
      wc <- Gen.choose(1L, 7L)
    } yield Map("a" -> wa, "b" -> wb, "c" -> wc)
    val p = Prop.forAll(genRows, genW) { (rows, w) =>
      val df = rows.toDF("id", "s", "tok")
      val got = InterleaveOps.proportionalInterleaveByTokens(
          df, "s", "id", "tok", w)
        .select("id", "mix_k", "mix_key", "seq")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      // sequential reference
      val g = w.values.reduce(gcd)
      val red = w.map { case (k, v) => k -> v / g }
      val m0 = lcmCap(red.values.map(2L * _).toSeq.distinct.sorted,
        1L << 42)
      val uMax = math.max(1L, rows.groupBy(_._2)
        .map { case (s, rs) =>
          if (red.contains(s)) rs.map(_._3).sum else 0L }
        .foldLeft(0L)(math.max))
      val wMax = red.values.max
      val m = math.max(1L, math.min(m0,
        Long.MaxValue / (2L * math.max(uMax, wMax))))
      val perStratum = rows.groupBy(_._2)
      val keyed = perStratum.toSeq.flatMap { case (s, rs) =>
        red.get(s) match {
          case None => Nil
          case Some(ws) =>
            var cum = 0L
            rs.sortBy(_._1).zipWithIndex.map { case ((id, _, sz), i) =>
              val x = 2L * cum + sz
              val key = (x / (2 * ws)) * m + ((x % (2 * ws)) * m) / (2 * ws)
              cum += sz
              (id, s, i + 1L, key)
            }
        }
      }
      val want = keyed.sortBy { case (_, s, k, key) => (key, s, k) }
        .zipWithIndex
        .map { case ((id, _, k, key), pos) =>
          id -> (k, key, pos + 1L) }.toMap
      got == want
    }
    assert(holds(p, 8))
  }

  test("groupSplit == driver reference on random group shapes") {
    val splits = Seq(("x", 1L, 2L), ("y", 1L, 3L), ("z", 1L, 6L))
    val genRows = Gen.nonEmptyListOf(Gen.choose(0, 9))
      .map(_.zipWithIndex.map { case (gIx, i) =>
        (i.toLong, s"g$gIx") })
    val p = Prop.forAll(genRows) { rows =>
      val df = rows.toDF("id", "grp")
      val got = SampleOps.groupSplit(df, "grp", splits, "ps")
        .select("id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val sizes = rows.groupBy(_._2).map { case (gr, rs) =>
        gr -> rs.length.toLong }
      val ordered = sizes.keys.toSeq.sortBy(gr => (coord("ps", gr), gr))
      val total = sizes.values.sum
      val c1 = (BigInt(total) / 2).toLong
      val c2 = (BigInt(total) * 5 / 6).toLong // 1/2 + 1/3
      var p0 = 0L
      val gSplit = ordered.map { gr =>
        val s = if (p0 < c1) "x" else if (p0 < c2) "y" else "z"
        p0 += sizes(gr); gr -> s
      }.toMap
      rows.forall { case (id, gr) => got(id) == gSplit(gr) }
    }
    assert(holds(p, 8))
  }

  test("stratifiedSampleExact == driver md5-rank reference") {
    val genRows = Gen.nonEmptyListOf(Gen.oneOf("a", "b"))
      .map(_.zipWithIndex.map { case (s, i) => (i.toLong, s) })
    val genFrac = Gen.oneOf((1L, 2L), (1L, 3L), (2L, 3L), (0L, 1L),
      (1L, 1L))
    val p = Prop.forAll(genRows, genFrac, genFrac) { (rows, fa, fb) =>
      val df = rows.toDF("id", "s")
      val got = SampleOps.stratifiedSampleExact(df, "id", "s",
          Map("a" -> fa), fb._1, fb._2, "pp")
        .select("id", "sampled").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      rows.groupBy(_._2).forall { case (s, rs) =>
        val (num, den) = if (s == "a") fa else fb
        val budget = (BigInt(rs.length) * num / den).toLong
        val wantIn = rs.map(_._1)
          .sortBy(id => (coord("pp", id.toString), id))
          .take(budget.toInt).toSet
        rs.forall { case (id, _) => got(id) == wantIn.contains(id) }
      }
    }
    assert(holds(p, 8))
  }

  test("streaming stamp is batch-prefix-stable: any batch split of " +
      "an id-ordered feed yields identical output") {
    import graft.streaming.{SizedDoc, StreamingInterleave}
    val genSizes = Gen.nonEmptyListOf(Gen.choose(0L, 9L))
    val genCut = Gen.choose(0, 10)
    val p = Prop.forAll(genSizes, genCut) { (sizes, cutRaw) =>
      val docs = sizes.zipWithIndex.map { case (sz, i) =>
        SizedDoc("a", i.toLong, sz) }
      val cut = math.min(cutRaw, docs.length)
      val w = Map("a" -> 3L)
      def drainAll(batches: Seq[Seq[SizedDoc]]) = {
        val st = new TestGroupState[(Long, Long)]
        batches.flatMap(b => StreamingInterleave.stampSized("a",
          b.iterator, st, w, 6L, 1L << 40).toSeq)
      }
      val oneShot = drainAll(Seq(docs))
      val split = drainAll(Seq(docs.take(cut), docs.drop(cut))
        .filter(_.nonEmpty))
      oneShot == split
    }
    assert(holds(p, 20)) // pure transitions: no Spark job per trial
  }
}
