package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Product quantization (PQ) for embedding search at corpus scale —
  * the memory-compression leg of the ANN family (Jégou, Douze &
  * Schmid, "Product Quantization for Nearest Neighbor Search",
  * IEEE TPAMI 33(1), 2011). A d-dim vector is split into `m`
  * contiguous subspaces; each subspace is vector-quantized against
  * its own `k`-entry codebook, so the stored form is `m` small codes
  * (here `array<int>`, conceptually bytes for k<=256) instead of `d`
  * floats — 4 B·d → m codes, a 32–64× footprint cut at the classic
  * d=768/m=96 shape. Search is ADC (asymmetric distance
  * computation): the query stays exact, each candidate's distance is
  * approximated as the sum over subspaces of table-looked-up
  * query→centroid distances — m lookups per candidate instead of d
  * multiplies.
  *
  * Why it matters at 100 TB: brute-force and IVF both carry the full
  * embedding through every scan and shuffle; with PQ the corpus-side
  * scan payload is the code array, so a 1000-executor top-k touches
  * ~1/40th the bytes and the hot set fits in memory where raw
  * vectors spill. Compose with IVF ([[ivfPqTopK]]) for the standard
  * IVFADC layout: coarse lists bound the candidate count, PQ codes
  * bound the bytes per candidate.
  *
  * Determinism (the property every oracle check here leans on): all
  * arithmetic is exact BIGINT in micro-units — vectors quantize once
  * via the repo's portable floor-round (`floor(x·2^scaleBits + 0.5)
  * + 2^(scaleBits+1)`, the [[ClusterOps]] scheme; the offset keeps
  * values positive so floor and truncating division coincide), L1
  * distances are order-invariant integer sums, argmin ties break to
  * the smallest code index, and the Lloyd update floor-rounds back
  * to integer micro-units as `(2s+n) div (2n)`. Two runs — or two
  * engines — produce bit-identical codebooks, codes, and distances.
  * L1 in the quantized domain differs from float-L2 PQ by the metric
  * choice only; the dataflow is metric-agnostic and the integer
  * domain is what makes the whole pipeline hash-checkable.
  *
  * Scale shape: training checkpoints the quantized corpus once and
  * scans it `iters` times; each iteration is ONE shuffle
  * (groupBy(sub, code, dim) with map-side combine → at most
  * partitions·m·k·dsub rows) and a driver collect of exactly m·k·dsub
  * centroid cells — parameter-bounded, never corpus-bounded. Encoding
  * is NARROW (per-row argmin against plan-literal codebooks; the
  * corpus never shuffles to learn its codes). ADC search broadcasts
  * nothing corpus-derived: the query side carries its own lookup
  * table as a computed column.
  *
  * Reference scope: the reference pipeline (a flux-tower ETL) has no
  * ANN operator; this extends the engine's similarity family
  * ([[Similarity]], [[ClusterOps]], [[SemDedup]]) per the build
  * brief's training-data mandate. */
object PqOps {

  /** PQ model: `codebook(s)(j)` is subspace `s`'s centroid `j` in
    * micro-units (length d/m each); `scaleBits` fixes the
    * quantization grid the codes were trained on. */
  final case class PqModel(codebook: Array[Array[Array[Long]]],
      scaleBits: Int) {
    def subspaces: Int = codebook.length
    def codes: Int = codebook.head.length
    def subDim: Int = codebook.head.head.length
    def dim: Int = subspaces * subDim
  }

  private def ckptSer(df: DataFrame): DataFrame =
    df.localCheckpoint(eager = true, StorageLevel.MEMORY_AND_DISK_SER)

  /** Quantize a float/double array column to positive BIGINT
    * micro-units (the [[ClusterOps]] grid — offsets cancel in every
    * L1 difference, so only the update's floor division needs the
    * all-positive guarantee). */
  private[graft] def quantize(vec: Column, scaleBits: Int): Column = {
    val scale = (1L << scaleBits).toDouble
    val offset = 1L << (scaleBits + 1)
    transform(vec, x =>
      floor(x.cast("double") * lit(scale) + lit(0.5d)) + lit(offset))
  }

  /** Literal column for one subspace's codebook: array<array<long>>. */
  private def cbLit(cb: Array[Array[Long]]): Column =
    array(cb.map(c => array(c.toIndexedSeq.map(lit): _*)).toIndexedSeq: _*)

  /** Staged per-subspace argmin projections over `qv` (the quantized
    * full vector): appends `__c0..__c{m-1}` code columns (0-based,
    * ties to the smallest index). Distances stage through a `__d`
    * column referenced twice (min + position) so CollapseProject
    * cannot re-inline the k·dsub arithmetic — the [[ClusterOps]]
    * staging rule. */
  private def withCodes(df: DataFrame, model: PqModel): DataFrame = {
    val dsub = model.subDim
    (0 until model.subspaces).foldLeft(df) { (d, s) =>
      val cents = cbLit(model.codebook(s))
      d.withColumn(s"__d$s",
          transform(cents, c =>
            aggregate(zip_with(slice(col("qv"), s * dsub + 1, dsub), c,
              (a, b) => abs(a - b)), lit(0L), (acc, x) => acc + x)))
        .withColumn(s"__c$s",
          (array_position(col(s"__d$s"), array_min(col(s"__d$s"))) - 1)
            .cast("int"))
        .drop(s"__d$s")
    }
  }

  /** Train `subspaces` codebooks of `k` centroids each with
    * deterministic integer Lloyd iterations (init = the k
    * smallest-id vectors' sub-slices — an engine-independent seed;
    * `iters = 0` returns that seed codebook unchanged). One corpus
    * scan + one bounded shuffle per iteration, all subspaces fused.
    * Requires dim % subspaces == 0 and at least k input rows.
    *
    * `seedPool > k` switches to the deterministic farthest-point
    * sweep ([[farthestSeed]]): collect the `seedPool` smallest-id
    * vectors and greedily pick k spread-out seeds — better codebooks
    * on clustered data (the smallest-id seed can land all k inits in
    * one cluster), still engine-portable and exact-integer. The
    * default (0) keeps the plain smallest-id seed. */
  def pqTrain(df: DataFrame, idCol: String, vecCol: String,
      subspaces: Int = 4, k: Int = 16, iters: Int = 2,
      scaleBits: Int = 20, seedPool: Int = 0): PqModel = {
    require(scaleBits >= 1 && scaleBits <= 30, s"scaleBits=$scaleBits")
    val q = ckptSer(df.select(col(idCol).cast("long").as("id"),
      quantize(col(vecCol), scaleBits).as("qv")))
    pqTrainOnQuantized(q, subspaces, k, iters, scaleBits, seedPool)
  }

  /** Deterministic farthest-point seed selection over a driver-side
    * sample (k-means++-style, but argmax instead of random-by-
    * distance so two engines agree): start from the smallest id,
    * then repeatedly add the sample vector with the LARGEST minimum
    * L1 distance to the chosen set (ties to the smaller position —
    * i.e. the smaller id, the sample being id-ordered). Exact
    * integer; O(|pool|·k) distance evaluations, driver-side on a
    * parameter-bounded pool. */
  private[graft] def farthestSeed(pool: Array[Array[Long]], k: Int)
      : Array[Array[Long]] = {
    require(pool.length >= k, s"farthestSeed: pool ${pool.length} < $k")
    val chosen = scala.collection.mutable.ArrayBuffer(0)
    // minDist(i) = min L1 distance from pool(i) to the chosen set
    val minDist = pool.map(v => l1(v, pool(0)))
    while (chosen.size < k) {
      var best = -1; var bestD = -1L
      var i = 0
      while (i < pool.length) {
        if (!chosen.contains(i) && minDist(i) > bestD) {
          bestD = minDist(i); best = i
        }
        i += 1
      }
      chosen += best
      i = 0
      while (i < pool.length) {
        val d = l1(pool(i), pool(best))
        if (d < minDist(i)) minDist(i) = d
        i += 1
      }
    }
    chosen.map(pool(_)).toArray
  }

  private def l1(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { s += math.abs(a(i) - b(i)); i += 1 }
    s
  }

  /** [[pqTrain]] over an ALREADY-quantized (id, qv) frame — the shared
    * core, also used by [[ivfPqTopKResidual]] to train on residuals
    * (which are re-offset to stay all-positive, so the Lloyd floor
    * division's floor==truncate identity holds there too). `q` must
    * be materialized (checkpointed) by the caller. */
  private def pqTrainOnQuantized(q: DataFrame, subspaces: Int, k: Int,
      iters: Int, scaleBits: Int, seedPool: Int = 0): PqModel = {
    require(subspaces >= 1 && k >= 1 && iters >= 0,
      s"subspaces=$subspaces k=$k iters=$iters")
    val poolN = if (seedPool > k) seedPool else k
    val pool = q.orderBy(col("id")).limit(poolN).collect()
      .map(_.getSeq[Long](1).toArray)
    require(pool.length >= k,
      s"pqTrain: need >= $k rows, got ${pool.length}")
    val seed =
      if (seedPool > k) farthestSeed(pool, k) else pool.take(k)
    val dim = seed.head.length
    require(dim % subspaces == 0, s"dim $dim % subspaces $subspaces != 0")
    val dsub = dim / subspaces
    var cb: Array[Array[Array[Long]]] = Array.tabulate(subspaces, k) {
      (s, j) => seed(j).slice(s * dsub, (s + 1) * dsub)
    }
    for (_ <- 1 to iters) {
      val model = PqModel(cb, scaleBits)
      // (sub, code, dim) -> (sum, count): map-side combine bounds the
      // shuffle at partitions·m·k·dsub rows; the collect is exactly
      // the codebook cell count.
      val stats = withCodes(q, model)
        .select(posexplode(array((0 until subspaces).map { s =>
          struct(lit(s).as("sub"), col(s"__c$s").as("cl"),
            slice(col("qv"), s * dsub + 1, dsub).as("sv"))
        }: _*)).as(Seq("__p", "e")))
        .select(col("e.sub"), col("e.cl"),
          posexplode(col("e.sv")).as(Seq("dim", "v")))
        .groupBy("sub", "cl", "dim")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
          (r.getLong(3), r.getLong(4)))
        .toMap
      cb = Array.tabulate(subspaces, k) { (s, j) =>
        if (!stats.contains((s, j, 0))) cb(s)(j) // empty: keep centroid
        else Array.tabulate(dsub) { i =>
          val (sm, n) = stats((s, j, i))
          (2 * sm + n) / (2 * n) // all-positive: floor == truncate
        }
      }
    }
    PqModel(cb, scaleBits)
  }

  /** Encode each row as its `m` nearest-centroid codes. NARROW — the
    * per-row argmin runs against plan-literal codebooks; the corpus
    * never shuffles or joins to be encoded. Returns
    * (idCol, codes: array<int>). */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      model: PqModel): DataFrame =
    withCodes(df.select(col(idCol).cast("long").as("id"),
        quantize(col(vecCol), model.scaleBits).as("qv")), model)
      .select(col("id").as(idCol),
        array((0 until model.subspaces).map(s => col(s"__c$s")): _*)
          .as("codes"))

  /** Append per-row PQ metadata over `vecCol`, all NARROW
    * (plan-literal codebooks, no shuffle/join): `__codes` (argmin
    * codes, array<int>), `__pqerr` = ‖v − recon(v)‖₂ and `__pqnorm`
    * = ‖recon(v)‖₂ in the raw double domain — the per-row scalars
    * [[SemDedup.semDedupPq]]'s exact-recall SDC bound needs.
    * Working names `qv`/`__c*`/`__recon*` must be free in `df`. */
  private[sim] def withPqMeta(df: DataFrame, vecCol: String,
      model: PqModel): DataFrame = {
    val scale = (1L << model.scaleBits).toDouble
    val off = 1L << (model.scaleBits + 1)
    val rec = array(model.codebook.map(sb => array(sb.map(cvec =>
      array(cvec.map(c => lit((c - off) / scale)).toIndexedSeq: _*))
      .toIndexedSeq: _*)).toIndexedSeq: _*)
    withCodes(df.withColumn("qv", quantize(col(vecCol), model.scaleBits)),
        model)
      .withColumn("__codes",
        array((0 until model.subspaces).map(s => col(s"__c$s")): _*))
      .drop((0 until model.subspaces).map(s => s"__c$s") :+ "qv": _*)
      .withColumn("__recon",
        concat((0 until model.subspaces).map(s =>
          element_at(element_at(rec, s + 1),
            element_at(col("__codes"), s + 1) + 1)): _*))
      // both scalars in one expression: __recon referenced twice, so
      // CollapseProject keeps the staged array (the ClusterOps rule)
      .withColumn("__pqs", struct(
        sqrt(aggregate(zip_with(col(vecCol).cast("array<double>"),
          col("__recon"), (a, b) => (a - b) * (a - b)), lit(0.0d),
          (acc, x) => acc + x)).as("e"),
        sqrt(aggregate(col("__recon"), lit(0.0d),
          (acc, x) => acc + x * x)).as("n")))
      .withColumn("__pqerr", col("__pqs.e"))
      .withColumn("__pqnorm", col("__pqs.n"))
      .drop("__recon", "__pqs")
  }

  /** Per-candidate ADC sum, unrolled over the m subspaces: plain
    * element_at chains stay inside whole-stage codegen, where the
    * equivalent aggregate-over-zip_with higher-order function
    * evaluates interpreted per candidate (the r14 q113 bench
    * finding). Reads the conventional `__lut`/`__codes` columns. */
  private def adcSum(m: Int): Column =
    (0 until m).map { s =>
      element_at(element_at(col("__lut"), s + 1),
        element_at(col("__codes"), s + 1) + 1)
    }.reduce(_ + _)

  /** Query-side ADC lookup table: `lut(s)(j)` = exact L1 (micro-units)
    * from the query's subspace-s slice to centroid j — computed once
    * per query ROW in the plan (m·k·dsub work), after which every
    * candidate costs m element_at lookups. */
  private def lutCol(qv: Column, model: PqModel): Column = {
    val dsub = model.subDim
    val cbAll = array((0 until model.subspaces)
      .map(s => cbLit(model.codebook(s))): _*)
    transform(sequence(lit(0), lit(model.subspaces - 1)), s =>
      transform(element_at(cbAll, s + 1), c =>
        aggregate(zip_with(
          slice(qv, s * lit(dsub) + 1, lit(dsub)), c,
          (a, b) => abs(a - b)), lit(0L), (acc, x) => acc + x)))
  }

  /** ADC top-k: exact queries against the PQ-encoded corpus
    * (`encoded` = [[pqEncode]] output). The corpus side moves only
    * (id, m codes); the query side is broadcast WITH its lookup
    * table, so the per-pair work is m integer lookups. Self-matches
    * (equal ids) are excluded. Returns (q_id, rank, n_id, adist) with
    * adist = approximate L1 in micro-units (BIGINT — exact,
    * engine-portable) ranked (adist ASC, n_id ASC).
    *
    * The query set must be caller-bounded (the [[Similarity
    * .bruteForceTopK]] contract — it is broadcast); for corpus-sized
    * query sets compose with IVF ([[ivfPqTopK]]) so each query meets
    * only its probed lists. */
  def adcTopK(queries: DataFrame, encoded: DataFrame, k: Int,
      model: PqModel, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).cast("long").as("q_id"),
        quantize(col(vecCol), model.scaleBits).as("qv"))
      .select(col("q_id"), lutCol(col("qv"), model).as("__lut"))
    val c = encoded.select(col(idCol).cast("long").as("n_id"),
      col("codes").as("__codes"))
    val scored = broadcast(q).join(c, col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        adcSum(model.subspaces).as("adist"))
    // bounded top-k aggregate (map-side k-heaps) — the plain
    // ascending adist key inherits nulls-first, the `.asc` window
    // default this site used; see [[graft.functions.TopK]]
    graft.functions.TopK.perQueryCut(scored, k, col("adist"), "adist")
  }

  /** Two-stage retrieval: ADC shortlist + EXACT rerank — the standard
    * FAISS refinement (Jégou et al. 2011 §VII "re-ranking"): stage 1
    * ranks a `shortlist`-sized candidate set per query by cheap ADC
    * lookups over the code corpus; stage 2 re-scores ONLY those
    * shortlist·|Q| candidates with the exact integer L1 on the full
    * quantized vectors and returns the top k. Buys back the
    * quantization error of pure ADC at the cost of one
    * candidate-sliver join — the corpus-wide scan still moves only
    * codes, and the exact vectors are fetched for shortlist·|Q| rows,
    * not N. The vector fetch join is shuffle-hash-pinned (corpus-
    * derived side, never estimate-broadcast); the query side rides
    * the same bounded-broadcast contract as [[adcTopK]].
    * Returns (q_id, rank, n_id, dist) with dist = EXACT micro-unit
    * L1, ranked (dist ASC, n_id ASC). Requires shortlist >= k. */
  def adcRerankTopK(queries: DataFrame, corpus: DataFrame,
      encoded: DataFrame, k: Int, shortlist: Int, model: PqModel,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val cand = adcTopK(queries, encoded, shortlist, model, idCol, vecCol)
      .select("q_id", "n_id")
    val nvec = corpus.select(col(idCol).cast("long").as("n_id"),
      quantize(col(vecCol), model.scaleBits).as("__nqv"))
    val qvec = queries.select(col(idCol).cast("long").as("q_id"),
      quantize(col(vecCol), model.scaleBits).as("__qqv"))
    val rescored = cand.join(nvec.hint("shuffle_hash"), "n_id")
      .join(broadcast(qvec), "q_id")
      .select(col("q_id"), col("n_id"),
        aggregate(zip_with(col("__qqv"), col("__nqv"),
          (a, b) => abs(a - b)), lit(0L), (acc, x) => acc + x)
          .as("dist"))
    graft.functions.TopK.perQueryCut(rescored, k, col("dist"), "dist")
  }

  /** IVFADC: coarse-quantize the corpus into inverted lists (integer
    * L1 against a count-derived id-modulo centroid sample — the
    * [[Similarity.ivfTopK]] seed, kept deterministic and
    * oracle-expressible), PQ-encode every row, then let each query
    * score only its `nProbe` nearest lists via ADC. Corpus work per
    * query drops from N to ~N·nProbe/C and each scored candidate
    * costs m lookups over an m-code payload — the standard 100 TB ANN
    * layout (IVFADC, Jégou et al. 2011 §IV; raw-vector codes rather
    * than residual codes — residual encoding refines recall but does
    * not change the dataflow). The centroid count is the invariant
    * (|C| stays collect-small however big the corpus grows); the
    * probes↔lists join is merge-pinned so the corpus-derived list
    * table can never be estimate-broadcast. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      model: PqModel, numCoarse: Int = 256, nProbe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centroidStride: Long = 0L, coarseIters: Int = 0,
      coarseSeed: String = "stride"): DataFrame = {
    // by-name into coarseSeedSet: the full-corpus count only runs on
    // the "stride" seed path (the farthest-point path never reads it)
    lazy val stride =
      if (centroidStride > 0L) centroidStride
      else math.max(1L, corpus.count() / math.max(1, numCoarse))
    val qcorp = ckptSer(corpus.select(col(idCol).cast("long").as("id"),
      quantize(col(vecCol), model.scaleBits).as("qv")))
    // Coarse centroids: quantized id-modulo sample (ordered by id so
    // list ids are stable) or the greedy-d² farthest-point seeds,
    // optionally Lloyd-refined; the collect is |C|-bounded by
    // contract.
    val cents: Array[Array[Long]] =
      coarseSeedSet(qcorp, stride, numCoarse, coarseSeed, coarseIters)
    if (cents.isEmpty)
      return queries.sparkSession.emptyDataFrame
        .withColumn("q_id", lit(0L)).withColumn("rank", lit(1))
        .withColumn("n_id", lit(0L)).withColumn("adist", lit(0L))
        .limit(0)
    def nearestLists(qv: Column, n: Int): Column =
      nearestListsCol(qv, cents, n)
    val lists = withCodes(qcorp, model)
      .select(col("id").as("n_id"),
        array((0 until model.subspaces).map(s => col(s"__c$s")): _*)
          .as("__codes"),
        element_at(nearestLists(col("qv"), 1), 1).as("list_id"))
    val probes = queries
      .select(col(idCol).cast("long").as("q_id"),
        quantize(col(vecCol), model.scaleBits).as("qv"))
      .select(col("q_id"), lutCol(col("qv"), model).as("__lut"),
        explode(nearestLists(col("qv"), nProbe)).as("list_id"))
    graft.functions.TopK.perQueryCut(
      probes.join(lists.hint("merge"), "list_id")
        .filter(col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("n_id"),
          adcSum(model.subspaces).as("adist")),
      k, col("adist"), "adist")
  }

  /** The n nearest coarse lists (by exact integer L1, ties to the
    * smaller index) as an array<int> column — the fused
    * [[graft.functions.NearestListsL1]] kernel, bit-identical to the
    * relational `array_sort(zip_with(...struct(L1, idx)...))` form it
    * replaced (kernel-vs-relational parity spec-pinned; the HOF form
    * cost 2,535 task-seconds at the f100 smoke's 200k×447 point). */
  private def nearestListsCol(qv: Column, cents: Array[Array[Long]],
      n: Int): Column =
    graft.functions.NearestListsL1.topIdx(qv,
      cents.map(_.toIndexedSeq).toIndexedSeq, n)

  /** Coarse centroid set for the IVF family: the deterministic
    * id-modulo seed sample, optionally refined by `coarseIters`
    * integer Lloyd rounds over the FULL quantized vectors — the
    * [[pqTrain]] update `(2s + n) div (2n)` (round-half-up mean;
    * floor == truncate since quantize() keeps every component
    * positive) applied per dimension, assignment on the fused
    * [[graft.functions.NearestListsL1]] kernel, ties to the smaller
    * index, EMPTY lists keep their seed. Why it matters: the raw
    * id-modulo sample is unclustered, so at production scale probe
    * recall degrades to ~probed-fraction (measured in the r15 recall
    * sweep); one Lloyd round concentrates lists around actual
    * density at the cost of one corpus pass per round. Each round is
    * ONE map-side-combining aggregation collecting |C|·(d+1) cells —
    * parameter-bounded, never corpus-bounded. All-integer and
    * oracle-replayable (q125 replays the round in DuckDB). */
  private[graft] def coarseCentroids(qcorp: DataFrame, stride: Long,
      coarseIters: Int, idC: String = "id", qvC: String = "qv")
      : Array[Array[Long]] =
    lloydRefine(qcorp,
      qcorp.filter(pmod(col(idC), lit(stride)) === 0)
        .orderBy(idC).select(qvC).collect()
        .map(_.getSeq[Long](0).toArray),
      coarseIters, qvC)

  /** Deterministic greedy-d² (farthest-point) seed set — the
    * k-means++ idea with the RNG removed (VERDICT r15 ask #5): seed 0
    * is the smallest-id row; each subsequent seed is the corpus row
    * MAXIMIZING its min integer-L1 distance to the seeds already
    * chosen (ties to the smaller id).
    *
    * When to use — measured honestly (r16 f1 recall A/B in
    * BENCH_NOTES): this is the repair for ID-CONTENT CORRELATION
    * (crawl order, per-source id blocks), where the id-modulo stride
    * sample collapses onto one region of the space. On id-UNIFORM
    * corpora the stride sample is already an unbiased uniform seed
    * and BEATS this traversal by 10–20% relative recall at low
    * nProbe: the deterministic argmax is outlier-greedy (k-means++
    * randomizes the d² choice precisely to avoid that; an
    * oracle-replayable engine cannot). Pair with `coarseIters >= 1`
    * — one Lloyd round largely repairs the outlier capture
    * (fps+lloyd1 ≈ stride+lloyd1 at nProbe ≥ 4). Defaults stay
    * `"stride"`.
    *
    * All-integer, RNG-free, and oracle-replayable (a recursive CTE —
    * q137). Selection stops early when the farthest remaining point
    * is AT distance 0 (every unchosen row duplicates a seed; more
    * lists would sit empty).
    *
    * Scale shape: each round is ONE corpus pass — the fused
    * [[graft.functions.MinDistL1]] kernel (constant codegen size,
    * early-exit inner loop) under a `TakeOrderedAndProject` that
    * returns `batch` rows to the driver — so the collect is
    * batch≤|C|-bounded and nothing corpus-sized moves. Total cost is
    * ~|C|/batch passes ≈ N·|C|²·d/(2·batch) distance terms;
    * `batch > 1` trades k-means||-style within-round spread loss for
    * proportionally fewer passes (batch rows are picked against the
    * SAME pre-round seed set). The oracle pins batch = 1. */
  private[graft] def farthestPointSeeds(qcorp: DataFrame,
      numCoarse: Int, batch: Int = 1, idC: String = "id",
      qvC: String = "qv"): Array[Array[Long]] = {
    require(numCoarse >= 1 && batch >= 1,
      s"farthestPointSeeds: numCoarse=$numCoarse batch=$batch")
    val first = qcorp.orderBy(col(idC)).select(qvC).limit(1).collect()
    if (first.isEmpty) return Array.empty
    val seeds = scala.collection.mutable.ArrayBuffer(
      first(0).getSeq[Long](0).toArray)
    var exhausted = false
    while (!exhausted && seeds.length < numCoarse) {
      val b = math.min(batch, numCoarse - seeds.length)
      val next = qcorp.select(col(qvC),
          graft.functions.MinDistL1.minDist(col(qvC),
            seeds.toSeq.map(_.toIndexedSeq)).as("__d"),
          col(idC).as("__sid"))
        .filter(col("__d") > 0L)
        .orderBy(col("__d").desc, col("__sid").asc)
        .limit(b).select(qvC).collect()
      if (next.isEmpty) exhausted = true
      else seeds ++= next.map(_.getSeq[Long](0).toArray)
    }
    seeds.toArray
  }

  /** Coarse seed-set dispatch for the IVF family: `"stride"` = the
    * id-modulo sample (the default, cheapest — zero extra passes),
    * `"farthest"` = [[farthestPointSeeds]] (|C| passes, density-
    * spread lists). Either seed is then Lloyd-refined `coarseIters`
    * times by [[lloydRefine]]. */
  private[graft] def coarseSeedSet(qcorp: DataFrame, stride: => Long,
      numCoarse: Int, coarseSeed: String, coarseIters: Int,
      idC: String = "id", qvC: String = "qv"): Array[Array[Long]] =
    coarseSeed match {
      case "stride" => coarseCentroids(qcorp, stride, coarseIters, idC, qvC)
      case "farthest" => lloydRefine(qcorp,
        farthestPointSeeds(qcorp, numCoarse, 1, idC, qvC),
        coarseIters, qvC)
      case other => throw new IllegalArgumentException(
        s"coarseSeed must be 'stride' or 'farthest', got '$other'")
    }

  /** `coarseIters` integer Lloyd rounds over a given seed set — the
    * refinement half of [[coarseCentroids]], split out so any seeder
    * ([[farthestPointSeeds]]) composes with it. */
  private[graft] def lloydRefine(qcorp: DataFrame,
      seedCents: Array[Array[Long]], coarseIters: Int,
      qvC: String = "qv"): Array[Array[Long]] = {
    var cents = seedCents
    if (cents.isEmpty) return cents
    val d = cents.head.length
    for (_ <- 0 until coarseIters) {
      val assigned = qcorp.select(col(qvC).as("__cqv"),
          element_at(nearestListsCol(col(qvC), cents, 1), 1).as("__cl"))
        .filter(col("__cl").isNotNull)
      val aggs = (0 until d).map(i =>
        sum(element_at(col("__cqv"), i + 1)).as(s"s$i"))
      val stats = assigned.groupBy("__cl")
        .agg(count(lit(1)).as("__n"), aggs: _*).collect()
      val byCl = stats.map(r => r.getInt(0) -> r).toMap
      cents = cents.indices.map { j =>
        byCl.get(j) match {
          case None => cents(j) // empty list keeps its seed
          case Some(r) =>
            val n = r.getLong(1)
            Array.tabulate(d)(i => (2L * r.getLong(2 + i) + n) / (2L * n))
        }
      }.toArray
    }
    cents
  }

  /** IVFADC with RESIDUAL encoding — the standard recall refinement
    * (Jégou et al. 2011 §IV.B): the PQ codebook is trained on, and
    * each row encoded as, `vec − coarseCentroid(itsList)` instead of
    * the raw vector. Residuals cluster much tighter than raw vectors
    * (the coarse quantizer has already absorbed the between-list
    * variance), so the same m·k code budget spends its resolution on
    * the within-list detail that actually ranks neighbors. The
    * dataflow is [[ivfPqTopK]]'s unchanged — coarse assignment,
    * narrow encode, merge-pinned probes↔lists join — plus one narrow
    * subtraction per row; the query side computes a lookup table PER
    * PROBED LIST (its residual differs per list), i.e. nProbe·m·k·dsub
    * work per query instead of m·k·dsub, the documented IVFADC cost.
    *
    * Exactness: residuals are re-offset by +2^(scaleBits+2) so every
    * component stays positive (|component| < 2^(scaleBits+2) whenever
    * the input coordinates are within the quantize() domain |x| < 2),
    * keeping the Lloyd update's floor==truncate identity; the
    * constant shift cancels in every L1 difference. Trains its own
    * codebook internally (on residuals) — `subspaces`/`codes`/`iters`
    * mirror [[pqTrain]]'s parameters. `coarseIters` Lloyd-refines
    * the coarse quantizer before assignment ([[coarseCentroids]],
    * the [[ivfPqTopK]] knob) — list quality matters MOST here, since
    * both the residual magnitudes and the codebook train against
    * the assigned centroid (VERDICT r15 ask #8). */
  def ivfPqTopKResidual(queries: DataFrame, corpus: DataFrame, k: Int,
      subspaces: Int = 4, codes: Int = 16, iters: Int = 1,
      numCoarse: Int = 256, nProbe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      scaleBits: Int = 20, centroidStride: Long = 0L,
      coarseIters: Int = 0, coarseSeed: String = "stride"): DataFrame = {
    // by-name into coarseSeedSet: the full-corpus count only runs on
    // the "stride" seed path (the farthest-point path never reads it)
    lazy val stride =
      if (centroidStride > 0L) centroidStride
      else math.max(1L, corpus.count() / math.max(1, numCoarse))
    val offR = 1L << (scaleBits + 2)
    val qcorp = ckptSer(corpus.select(col(idCol).cast("long").as("id"),
      quantize(col(vecCol), scaleBits).as("qv")))
    val cents: Array[Array[Long]] =
      coarseSeedSet(qcorp, stride, numCoarse, coarseSeed, coarseIters)
    if (cents.isEmpty)
      return queries.sparkSession.emptyDataFrame
        .withColumn("q_id", lit(0L)).withColumn("rank", lit(1))
        .withColumn("n_id", lit(0L)).withColumn("adist", lit(0L))
        .limit(0)
    val cl = cbLit(cents)
    // Narrow per-row residual: assigned list + re-offset subtraction.
    // Persisted (NOT localCheckpoint'd) so training iterations and
    // the encode pass re-read the residual, not the assignment
    // arithmetic. A checkpoint here is a correctness mine: the
    // list_id alias's equality constraint references the raw qv that
    // the projection drops, and LogicalRDD freezes that dangling
    // constraint — the later equi-join on list_id then lets
    // InferFiltersFromConstraints substitute it onto the QUERY side,
    // where the raw corpus qv is unresolvable
    // (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND at execution). With
    // persist the plan survives, constraints prune normally, and the
    // cache still makes every scan read materialized residuals.
    val resCorp = qcorp
      .withColumn("list_id",
        element_at(nearestListsCol(col("qv"), cents, 1), 1))
      .select(col("id"), col("list_id"),
        zip_with(col("qv"), element_at(cl, col("list_id") + 1),
          (a, b) => a - b + lit(offR)).as("qv"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    // The corpus-scale residual cache is released once the (query·k
    // bounded) result is materialized — without the eager checkpoint
    // + finally-unpersist, each call would leak a cached corpus RDD
    // for the session lifetime (ADVICE r14).
    try {
      val model = pqTrainOnQuantized(resCorp.select("id", "qv"),
        subspaces, codes, iters, scaleBits)
      val lists = withCodes(resCorp, model)
        .select(col("id").as("n_id"), col("list_id"),
          array((0 until model.subspaces).map(s => col(s"__c$s")): _*)
            .as("__codes"))
      // Query side: one residual + lookup table per probed list. The
      // residual stages through its own named column (fresh name, no
      // overlap with the corpus side's "qv") before the LUT lambda
      // reads it — referencing the pre-explode vector inside nested
      // higher-order lambdas after the Generate mis-binds.
      val probes = queries
        .select(col(idCol).cast("long").as("q_id"),
          quantize(col(vecCol), scaleBits).as("__qqv"))
        .select(col("q_id"), col("__qqv"),
          explode(nearestListsCol(col("__qqv"), cents, nProbe))
            .as("list_id"))
        .withColumn("__qrv",
          zip_with(col("__qqv"), element_at(cl, col("list_id") + 1),
            (a, b) => a - b + lit(offR)))
        .select(col("q_id"), col("list_id"),
          lutCol(col("__qrv"), model).as("__lut"))
      graft.functions.TopK.perQueryCut(
        probes.join(lists.hint("merge"), "list_id")
          .filter(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("n_id"),
            adcSum(model.subspaces).as("adist")),
        k, col("adist"), "adist")
        .localCheckpoint(eager = true, StorageLevel.MEMORY_AND_DISK_SER)
    } finally resCorp.unpersist(blocking = false)
  }
}
