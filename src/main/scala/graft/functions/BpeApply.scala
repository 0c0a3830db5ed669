package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE merge application (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units", ACL) as ONE native
  * Catalyst expression over a pre-tokenized word array: each word is
  * split into characters and the learned merges are applied
  * greedily — always the LOWEST-RANK applicable merge first, the
  * reference encoder's rule — until none applies; the doc's subword
  * stream is the concatenation over its words in order.
  *
  * WHY a kernel: merge application is an inherently iterative
  * per-word loop (each merge changes the adjacency structure the
  * next lookup keys on) — not expressible in relational operators or
  * HOFs at all, and exactly the imperative-scan shape the round-11
  * kernel family exists for. The merge table is PARAMETER-sized
  * (the learned vocabulary, carried in the expression tree and
  * shipped once per task like any literal); per-doc work is cached
  * per distinct word, since corpus word frequency is Zipfian.
  * [[KernelCodegen]] keeps the enclosing stage fused. */
object BpeKernel {

  /** Column API: subword array of a token-array column under the
    * ranked merge list (rank = list position). */
  def applyMerges(tokens: Column, merges: Seq[(String, String)])
      : Column =
    ColumnBridge.column(
      BpeApplyExpr(ColumnBridge.expression(tokens), merges))

  /** Encode ONE word under the ranked merges — the single
    * implementation both the kernel and the driver-side learner's
    * verification share (words are short and the kernel caches per
    * distinct word, so the rescan-per-round loop is not a hot
    * spot). */
  def encodeWordScalar(word: String,
      ranks: Map[(String, String), Int]): Seq[String] = {
    var syms = word.map(_.toString).toVector
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var at = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; at = i }
        i += 1
      }
      if (at < 0) done = true
      else {
        syms = (syms.take(at) :+ (syms(at) + syms(at + 1))) ++
          syms.drop(at + 2)
        if (syms.length < 2) done = true
      }
    }
    syms
  }
}

/** See [[BpeKernel]]. Null-safe unary over array<string>; empty
  * array in, empty array out. */
case class BpeApplyExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_apply"

  @transient private lazy val ranks: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // per-doc word cache: Zipfian corpora repeat words constantly
    val cache = new java.util.HashMap[String, Seq[UTF8String]]()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i).toString
      var subs = cache.get(w)
      if (subs == null) {
        subs = BpeKernel.encodeWordScalar(w, ranks)
          .map(UTF8String.fromString)
        cache.put(w, subs)
      }
      out ++= subs
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BpeApplyExpr = copy(child = newChild)
}
