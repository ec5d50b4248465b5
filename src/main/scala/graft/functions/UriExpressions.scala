package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Percent-encoding normalization for URI-path comparison.
  *
  * RFC 9309 §2.2.2 compares robots rules to request paths on a
  * CANONICAL percent-encoded form (octets outside US-ASCII and the
  * RFC 3986 reserved set "MUST be percent-encoded … prior to
  * comparison"). The safe, deterministic core of that canonical form
  * is RFC 3986 §6.2.2.2 syntax-based normalization: DECODE the
  * escapes that name UNRESERVED characters (ALPHA / DIGIT / `-` `.`
  * `_` `~` — spellings of the same path that differ only in
  * unnecessary escaping collapse), and CASE-NORMALIZE the hex of
  * every escape that stays (`%2f` ≡ `%2F`). Reserved-character
  * escapes stay encoded — crucially `%2F` (the 9309 carve-out: an
  * encoded slash is not a path separator) and `%2A`/`%24`, whose
  * decode would FABRICATE a wildcard or end anchor the robots author
  * explicitly escaped. Invalid escapes (`%`, `%3`, `%zz`) and
  * non-US-ASCII escapes (multibyte UTF-8 spellings) pass through as
  * written. Applied identically to BOTH sides of the compliance
  * match — normalizing only one side is worse than neither.
  */
object UriFunctions {
  private def unreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  // RFC 3986 HEXDIG is ASCII-only: a fullwidth or Arabic-Indic
  // "digit" is NOT a valid escape and must stay literal —
  // Character.digit would accept it
  private def asciiHex(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  private val Percent = UTF8String.fromString("%")

  /** The kernel: identity fast path when no '%' is present (the
    * overwhelmingly common case for corpus paths — one byte scan, no
    * allocation), else one forward pass sized to the input. */
  def percentNormalize(s: UTF8String): UTF8String = {
    if (!s.contains(Percent)) return s
    val str = s.toString
    val n = str.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c == '%' && i + 2 < n) {
        val hi = asciiHex(str.charAt(i + 1))
        val lo = asciiHex(str.charAt(i + 2))
        if (hi >= 0 && lo >= 0) {
          val v = hi * 16 + lo
          if (v < 0x80 && unreserved(v.toChar)) sb.append(v.toChar)
          else {
            sb.append('%')
            sb.append(java.lang.Character.toUpperCase(str.charAt(i + 1)))
            sb.append(java.lang.Character.toUpperCase(str.charAt(i + 2)))
          }
          i += 3
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }

  /** String convenience of the kernel (host-key path comparison). */
  def percentNormalize(s: String): String =
    percentNormalize(UTF8String.fromString(s)).toString

  def percentNormalize(c: Column): Column =
    ColumnBridge.column(PercentNormalize(ColumnBridge.expression(c)))
}

case class PercentNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_percent_normalize"
  override protected def nullSafeEval(v: Any): Any =
    UriFunctions.percentNormalize(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // static kernel call: stays inside whole-stage codegen (the
    // fnv1a shape) — the per-row cost is the one O(len) pass
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UriFunctions.percentNormalize($c);")
  override protected def withNewChildInternal(c: Expression): PercentNormalize = copy(child = c)
}
