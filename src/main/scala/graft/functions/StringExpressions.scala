package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the longest-common-prefix length (in
  * characters) of two strings — the inner kernel of the exact substring
  * dedup tier (SuffixArray: LCP between rank-adjacent suffixes, and the
  * incremental delta-vs-base match join).
  *
  * Replaces `size(filter(sequence(1, cap), j -> substring(a,1,j) =
  * substring(b,1,j)))`, which allocates `cap` UTF8String slices and
  * re-compares O(j) chars at each step — O(cap²) char work plus a
  * lambda frame per element, per candidate pair. This is a single
  * byte-wise scan: O(lcp) work, zero allocation, and `doGenCode` emits
  * a straight-line loop that stays inside whole-stage codegen. At sf10
  * the incremental join evaluates it on a ~10⁸-pair candidate stream —
  * the per-pair constant IS the operator's cost.
  *
  * Char semantics (matches the `substring`-based formula exactly):
  * bytes are compared directly, counting UTF-8 char starts (any byte
  * not 0b10xxxxxx); if the first mismatching byte lands mid-codepoint,
  * that partially-matched char is not counted. On valid UTF-8 two
  * distinct codepoints never share a prefix-byte relationship that
  * would overcount, so byte-scan char counting equals char-wise LCP;
  * on the ASCII corpus (SuffixArraySpec asserts char-code rank ≡
  * binary collation) bytes ARE chars. */
case class CommonPrefixLength(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "common_prefix_length"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    val n = math.min(x.numBytes(), y.numBytes())
    var i = 0
    var chars = 0
    while (i < n && x.getByte(i) == y.getByte(i)) {
      if ((x.getByte(i) & 0xC0) != 0x80) chars += 1
      i += 1
    }
    // a char that STARTS inside the matched prefix but continues past
    // it (next byte is a continuation byte) is only partially matched
    if (i < x.numBytes() && (x.getByte(i) & 0xC0) == 0x80) chars -= 1
    chars
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val chars = ctx.freshName("chars")
      s"""
         |int $n = java.lang.Math.min($a.numBytes(), $b.numBytes());
         |int $i = 0; int $chars = 0;
         |while ($i < $n && $a.getByte($i) == $b.getByte($i)) {
         |  if (($a.getByte($i) & 0xC0) != 0x80) $chars++;
         |  $i++;
         |}
         |if ($i < $a.numBytes() && ($a.getByte($i) & 0xC0) == 0x80) $chars--;
         |${ev.value} = $chars;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CommonPrefixLength =
    copy(left = l, right = r)
}
