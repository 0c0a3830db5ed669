package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding column — the SemDeDup
  * method (Abbas et al. 2023, arXiv:2303.09540): coarse-cluster the
  * corpus with a small quantizer, connect members whose pairwise
  * cosine clears a threshold into ε-clusters, and keep ONE document
  * per ε-cluster — the member LEAST similar to its coarse centroid
  * (the paper's choice: the kept exemplar is the most "edge of
  * cluster" sample, which preserves diversity better than keeping
  * the most typical one).
  *
  * Where [[Similarity.cosineNearDupPairs]] finds near-duplicate PAIRS
  * via hyperplane LSH (recall depends on band geometry), SemDeDup
  * trades that for exhaustive pairwise scoring WITHIN coarse
  * clusters: recall inside a cluster is exact, and the quadratic
  * blowup is bounded by the cluster size, which the caller controls
  * through `numCentroids` (size ~ N/C on balanced data; the paper
  * runs C = 11k on LAION-440M, ~40k per cluster).
  *
  * Scale shape, in order:
  *   1. centroid pick: deterministic id-modulo sample, same contract
  *      as [[Similarity.ivfTopK]] — the centroid COUNT is the
  *      parameter precisely so the set stays driver/plan-bounded.
  *   2. assignment: one fused codegen expression per row
  *      ([[graft.functions.NearestCentroids]]) — the corpus never
  *      joins or shuffles to learn its cluster.
  *   3. centroid cosine: broadcast join of the C-row centroid frame
  *      (cluster id equi-join) — corpus side stays where it is.
  *   4. pairs: self equi-join on the cluster id — ONE hash shuffle of
  *      the (id, norm, vec) projection, then per-cluster pairwise
  *      rescore. This is the step that is quadratic per cluster; size
  *      `numCentroids` so N/C stays in the ~10⁴–10⁵ band, or chain
  *      two levels of quantization before calling this.
  *   5. ε-clusters: [[graft.text.DedupOps.connectedComponents]] over
  *      the pair sliver (docs in no pair never enter the loop).
  *   6. exemplar: one shuffle on the component key; keep = argmin by
  *      (centroid cosine ASC NULLS FIRST, id ASC) — a total,
  *      engine-portable order (oracle-pinned by q87).
  *
  * Cosines are rounded to `roundScale` decimals (floor(x·p+0.5)/p)
  * everywhere, matching the IVF/near-dup operators, so thresholds and
  * rankings are reproducible across engines. Zero-norm or null
  * vectors score null cosine: they join no pair (the threshold
  * filter drops nulls), stay their own singleton component, and are
  * KEPT — dedup must not silently eat undecodable rows.
  *
  * Returns every corpus row: (id, cluster, cos_c, component, rep_id,
  * keep). Filter `keep` for the deduplicated corpus; the rest is the
  * audit trail (which exemplar absorbed each dropped doc).
  */
object SemDedup {

  private[sim] def rcos(p: Double)(v: Column, nv: Column, c: Column,
      nc: Column): Column =
    floor(when(nv > 0.0 && nc > 0.0, Similarity.dot(v, c) / (nv * nc))
      * p + 0.5) / p

  def semDedup(corpus: DataFrame, threshold: Double,
      numCentroids: Int = 256, idCol: String = "vec_id",
      vecCol: String = "embedding", roundScale: Int = 6,
      centroidStride: Long = 0L): DataFrame =
    run(corpus, threshold, numCentroids, idCol, vecCol, roundScale,
      centroidStride, pq = None)

  /** [[semDedup]] with a PQ-compressed pair stage (SDC — symmetric
    * distance computation, Jégou et al. 2011 §III): the quadratic
    * in-cluster self-join moves `m` int codes + three scalars per row
    * instead of the d-float vector (~16 B + 24 B vs 8·d B — a 95%+
    * payload cut at d=64, more at real embedding widths), and each
    * candidate pair costs m lookups into a plan-literal m·k·k
    * centroid-dot table instead of d multiplies. A rigorous error
    * bound makes the prefilter EXACT-recall: with ea = ‖a−recon(a)‖₂
    * and rn = ‖recon‖₂ (both per-row narrow scalars),
    * |dot(a,b) − dot(recon a, recon b)| ≤ rn_a·e_b + e_a·rn_b +
    * e_a·e_b, so any pair whose true rounded cosine clears the
    * threshold also clears the slackened approximate test; survivors
    * are exactly re-scored (two shuffled-hash joins of the candidate
    * sliver back to the vectors), so the OUTPUT is bit-identical to
    * [[semDedup]] — the approximation buys bytes and FLOPs, never
    * recall (spec-pinned; q113 pins it against q87's oracle).
    *
    * When it wins — and when it does not (measured, BENCH_NOTES r14
    * A/B): the prefilter only pays when the uncertain band is small,
    * i.e. codebooks tight enough (large m·k) that the error margins
    * are narrow AND in-cluster near-dup density low enough that few
    * pairs land in the band. On the factor-100 amplified corpus
    * (~100× duplication, m=4/k=16) nearly every pair is a true
    * near-dup, the margin covers most of the cosine range, and the
    * rescore joins add two corpus-scale shuffles — the exact path
    * won 9×. [[semDedup]] therefore stays the default; this variant
    * is the opt-in for wide-vector, selective-threshold corpora. */
  def semDedupPq(corpus: DataFrame, threshold: Double,
      numCentroids: Int = 256, idCol: String = "vec_id",
      vecCol: String = "embedding", roundScale: Int = 6,
      centroidStride: Long = 0L, pqSubspaces: Int = 4,
      pqCodes: Int = 16, pqIters: Int = 1): DataFrame =
    run(corpus, threshold, numCentroids, idCol, vecCol, roundScale,
      centroidStride, pq = Some((pqSubspaces, pqCodes, pqIters)))

  private def run(corpus: DataFrame, threshold: Double,
      numCentroids: Int, idCol: String, vecCol: String,
      roundScale: Int, centroidStride: Long,
      pq: Option[(Int, Int, Int)]): DataFrame = {
    val p = math.pow(10.0, roundScale)
    val stride =
      if (centroidStride > 0L) centroidStride
      else math.max(1L, corpus.count() / math.max(1, numCentroids))
    val centRows = corpus.filter(pmod(col(idCol), lit(stride)) === 0)
      .select(col(idCol).cast("long").as("c_id"),
        col(vecCol).cast("array<double>").as("c_vec"))
      .collect()
    val base = corpus.select(col(idCol).cast("long").as("id"),
        col(vecCol).as("vec"))
      .withColumn("norm", sqrt(Similarity.dot(col("vec"), col("vec"))))
    if (centRows.isEmpty) {
      // no quantizer (empty corpus): every doc is its own exemplar —
      // the same degenerate answer the full dataflow yields on the
      // empty pair set, returned without spinning up the CC loop.
      return base.select(col("id"), lit(null).cast("long").as("cluster"),
        lit(null).cast("double").as("cos_c"),
        col("id").as("component"), col("id").as("rep_id"),
        lit(true).as("keep"))
    }
    val cIds = centRows.map(_.getLong(0)).toSeq
    val cVecs = centRows.map(_.getSeq[Double](1)).toSeq
    // the same deterministic filter, kept as a (tiny) frame for the
    // broadcast centroid-cosine join — scanning the modulo sliver
    // twice is cheaper than round-tripping collected rows
    val centDf = corpus.filter(pmod(col(idCol), lit(stride)) === 0)
      .select(col(idCol).cast("long").as("c_id"),
        col(vecCol).cast("array<double>").as("c_vec"))
    // Eager serialized checkpoint: `members` embeds the fused
    // nearest-centroid assignment (|C| dot products per row) and
    // feeds FOUR consumers — both sides of the pair self-join, the
    // CC node set, and the final labeling — which would otherwise
    // re-run the quantizer per consumer (the multi-action recompute
    // class VERDICT_r10 flagged in DSIR). MEMORY_AND_DISK_SER: the
    // checkpoint carries the embeddings, which step 4's join needs
    // resident anyway.
    val members = base
      .withColumn("cluster", element_at(
        graft.functions.NearestCentroids.topIds(col("vec"), cIds, cVecs,
          1, roundScale), 1))
      .join(broadcast(centDf), col("cluster") === col("c_id"))
      .withColumn("c_norm", sqrt(Similarity.dot(col("c_vec"), col("c_vec"))))
      .withColumn("cos_c",
        rcos(p)(col("vec"), col("norm"), col("c_vec"), col("c_norm")))
      .select("id", "vec", "norm", "cluster", "cos_c")
      .localCheckpoint(eager = true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val pairs = pq match {
      case None => exactPairs(members, threshold, p)
      case Some((m, k, iters)) =>
        pqPairs(corpus, members, threshold, p, idCol, vecCol, m, k, iters)
    }
    val comp = graft.text.DedupOps.connectedComponents(
      members.select(col("id")), pairs)
    val w = Window.partitionBy(col("component"))
      .orderBy(col("cos_c").asc_nulls_first, col("id").asc)
    members.select("id", "cluster", "cos_c")
      .join(comp.hint("shuffle_hash"), "id")
      .withColumn("rep_id", first(col("id")).over(w))
      .withColumn("keep", col("id") === col("rep_id"))
  }

  /** The reference pair stage: vectors ride the cluster self-join,
    * each pair pays a d-dim cosine. */
  private def exactPairs(members: DataFrame, threshold: Double,
      p: Double): DataFrame = {
    val a = members.select(col("cluster"), col("id").as("id_a"),
      col("vec").as("va"), col("norm").as("na"))
    val b = members.select(col("cluster"), col("id").as("id_b"),
      col("vec").as("vb"), col("norm").as("nb"))
    a.join(b.hint("merge"), Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .filter(rcos(p)(col("va"), col("na"), col("vb"), col("nb"))
        >= threshold)
      .select("id_a", "id_b")
  }

  /** SDC pair stage: codes + error scalars ride the self-join; the
    * conservative bound admits every true pair (exact recall), the
    * exact rescore re-applies the true threshold on the sliver. */
  private def pqPairs(corpus: DataFrame, members: DataFrame,
      threshold: Double, p: Double, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int): DataFrame = {
    val model = PqOps.pqTrain(corpus, idCol, vecCol,
      subspaces = m, k = k, iters = iters)
    val scale = (1L << model.scaleBits).toDouble
    val off = 1L << (model.scaleBits + 1)
    // raw-domain reconstruction per (subspace, code): (centroid−off)/s
    val reconD: Array[Array[Array[Double]]] =
      model.codebook.map(_.map(_.map(c => (c - off) / scale)))
    // SDC table: tbl(s)(ja)(jb) = dot(recon(s,ja), recon(s,jb)), and
    // per-(s,code) recon norm² on its diagonal path — both literal.
    val tbl: Array[Array[Array[Double]]] =
      Array.tabulate(m, k, k) { (s, ja, jb) =>
        val a = reconD(s)(ja); val b = reconD(s)(jb)
        var d = 0.0; var i = 0
        while (i < a.length) { d += a(i) * b(i); i += 1 }
        d
      }
    val tblLit = array(tbl.map(sb => array(sb.map(row =>
      array(row.map(lit).toIndexedSeq: _*)).toIndexedSeq: _*))
      .toIndexedSeq: _*)
    // Narrow per-row PQ metadata over the checkpointed members: codes
    // (plan-literal argmin), recon err ‖v−recon‖₂, recon norm ‖recon‖₂.
    // Materialized ONCE — both sides of the pair self-join read it,
    // and the per-row argmin (m·k·dsub interpreted HOF work) must not
    // recompute per consumer (measured 2× ≈ 10 s at the sf0.1 bench
    // point). The checkpointed projection carries only attributes and
    // scalars sized ~50 B/row.
    val slim = PqOps.withPqMeta(members, "vec", model)
      .select(col("cluster"), col("id"), col("norm"),
        col("__codes"), col("__pqerr"), col("__pqnorm"))
      .localCheckpoint(eager = true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val a = slim.select(col("cluster"), col("id").as("id_a"),
      col("norm").as("na"), col("__codes").as("ca"),
      col("__pqerr").as("ea"), col("__pqnorm").as("ra"))
    val b = slim.select(col("cluster"), col("id").as("id_b"),
      col("norm").as("nb"), col("__codes").as("cb"),
      col("__pqerr").as("eb"), col("__pqnorm").as("rb"))
    // Unrolled over the m subspaces: plain element_at chains stay in
    // whole-stage codegen; an aggregate-over-sequence HOF evaluates
    // interpreted per pair (measured 22 s at the sf0.1 bench point).
    val sdcDot = (0 until m).map { s =>
      element_at(element_at(element_at(tblLit, s + 1),
        element_at(col("ca"), s + 1) + 1),
        element_at(col("cb"), s + 1) + 1)
    }.reduce(_ + _)
    // Exact-recall slack. The exact path admits any pair whose TRUE
    // cosine >= threshold − 0.5/p (round-half-up on the 1/p grid),
    // and the prefilter compares in DOT units (÷ na·nb happens before
    // the threshold), so the rounding-grid slack must be scaled by
    // the norm product: an absolute 1/p only covers na·nb ≤ 2 and
    // silently drops boundary pairs for larger norms (ADVICE r14).
    // margin = quantization bound (×(1+1e-12) fp headroom, relative)
    //        + (0.5/p + eps)·na·nb for the rounding grid.
    val margin = (col("ra") * col("eb") + col("ea") * col("rb") +
      col("ea") * col("eb")) * lit(1.0 + 1e-12) +
      (lit(0.5 / p) + lit(1e-9)) * col("na") * col("nb")
    val cand = a.join(b.hint("merge"), Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("na") > 0.0 && col("nb") > 0.0 &&
        (sdcDot + margin) / (col("na") * col("nb")) >= threshold)
      .select("id_a", "id_b")
    // exact rescore on the candidate sliver only — corpus-derived
    // sides strategy-pinned, never size-estimate broadcast
    val va = members.select(col("id").as("id_a"), col("vec").as("va"),
      col("norm").as("na"))
    val vb = members.select(col("id").as("id_b"), col("vec").as("vb"),
      col("norm").as("nb"))
    cand.join(va.hint("shuffle_hash"), "id_a")
      .join(vb.hint("shuffle_hash"), "id_b")
      .filter(rcos(p)(col("va"), col("na"), col("vb"), col("nb"))
        >= threshold)
      .select("id_a", "id_b")
  }
}
