package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** 64-bit SimHash as four 16-bit words, fused into ONE native
  * Catalyst expression over a pre-tokenized array: word j's bit b is
  * the sign of the vote sum over token OCCURRENCES (not distinct
  * tokens — repetition weights the vote, the standard Charikar
  * construction) of +-1 by bit b of hex digits [4j+1, 4j+4] of
  * md5(token). Values are BIT-IDENTICAL to the relational
  * explode + 64-conditional-sum-votes + join-back formulation this
  * replaces ([[graft.text.DedupOps.simhashTable64]]); word 0 is the
  * 16-bit demo signature of `simhashTable`. A doc with NO tokens
  * votes 0 on every bit and 0 >= 0 sets the bit, so empty docs give
  * all-ones words — the kernel returns that directly instead of the
  * relational path's left-join + coalesce resurrection (callers
  * still coalesce for NULL token arrays, which the null-safe
  * expression maps to null).
  *
  * WHY: the signature is a pure per-doc function of the token
  * stream, but the relational form paid a corpus-wide explode +
  * groupBy(id) shuffle of every token row plus a join back onto the
  * doc spine. Narrow kernel -> the first exchange of the SimHash
  * chain is the band-key self-join. Same trade as [[MinhashSig]] /
  * [[WinnowSelect]] (BENCH_NOTES round 11).
  */
object SimhashKernel {

  /** Scalar reference: the four 16-bit words of one token sequence
    * (spec contract). */
  def wordsScalar(tokens: Seq[String]): Seq[Long] = {
    val votes = Array.ofDim[Long](4, 16)
    val md = java.security.MessageDigest.getInstance("MD5")
    tokens.foreach { t =>
      md.reset()
      val d = md.digest(t.getBytes("UTF-8"))
      var j = 0
      while (j < 4) {
        val h = ((d(2 * j) & 0xffL) << 8) | (d(2 * j + 1) & 0xffL)
        var b = 0
        while (b < 16) {
          votes(j)(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
          b += 1
        }
        j += 1
      }
    }
    (0 until 4).map { j =>
      (0 until 16).map(b => if (votes(j)(b) >= 0) 1L << b else 0L).sum
    }
  }

  /** Column API over a token-array column: array<bigint> length 4. */
  def words(tokens: Column): Column =
    ColumnBridge.column(SimhashWords(ColumnBridge.expression(tokens)))
}

/** See [[SimhashKernel]]. Null-safe unary over array<string>. */
case class SimhashWords(child: Expression)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_words"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Long](64) // [j * 16 + b]
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i)
      if (tok != null) {
        md.reset()
        val d = md.digest(tok.getBytes)
        var j = 0
        while (j < 4) {
          val h = ((d(2 * j) & 0xffL) << 8) | (d(2 * j + 1) & 0xffL)
          var b = 0
          while (b < 16) {
            votes(j * 16 + b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
            b += 1
          }
          j += 1
        }
      }
      i += 1
    }
    val words = new Array[Any](4)
    var j = 0
    while (j < 4) {
      var w = 0L
      var b = 0
      while (b < 16) {
        if (votes(j * 16 + b) >= 0L) w |= (1L << b)
        b += 1
      }
      words(j) = w
      j += 1
    }
    new GenericArrayData(words)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : SimhashWords = copy(child = newChild)
}
