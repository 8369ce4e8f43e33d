package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Full (unrestricted) Damerau–Levenshtein distance: edit distance
  * whose operations are insert, delete, substitute, AND transpose of
  * two adjacent characters — the variant that models the dominant
  * human typo class a plain Levenshtein overcounts (lev("ab","ba")=2
  * but one transposition happened). Spark ships only `levenshtein`;
  * entity-resolution blocking that keys on typo distance needs this.
  *
  * This is the alphabet-indexed dynamic program (Lowrance & Wagner
  * 1975, public), O(|a|·|b|) time — NOT the restricted
  * optimal-string-alignment shortcut, which disagrees on inputs like
  * ("CA","ABC"): OSA gives 3, true DL gives 2 because a substring may
  * be edited after a transposition. Distances are computed over UTF-8
  * BYTES — exactly the semantics of DuckDB's `damerau_levenshtein`,
  * which is what the oracle compares against (ASCII inputs are
  * byte ≡ char; multi-byte code points count per byte on both sides).
  */
object DamerauLevenshtein {
  /** The transposition lookback needs the WHOLE (|a|+2)×(|b|+2)
    * matrix (no two-row trick as in plain Levenshtein), so memory is
    * O(|a|·|b|). 8 KiB × 8 KiB = 256 MiB of Int already threatens an
    * executor; distance is an entity-resolution primitive for keys
    * and names, not corpus documents — fail fast rather than OOM. */
  val MaxInputBytes = 8192

  def distance(a: UTF8String, b: UTF8String): Int = {
    val sa = a.getBytes
    val sb = b.getBytes
    val la = sa.length
    val lb = sb.length
    require(la <= MaxInputBytes && lb <= MaxInputBytes,
      s"damerau_levenshtein inputs capped at $MaxInputBytes bytes " +
        s"(got $la, $lb): the full-matrix DP is O(|a|*|b|) heap; use " +
        s"levenshtein() or pre-truncate for document-scale strings")
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    val da = new Array[Int](256)
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k = da(sb(j - 1) & 0xff)
        val l = db
        var cost = 1
        if (sa(i - 1) == sb(j - 1)) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        d(i + 1)(j + 1) =
          math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da(sa(i - 1) & 0xff) = i
      i += 1
    }
    d(la + 1)(lb + 1)
  }
}

/** `damerau_levenshtein(a, b)` as a native expression: whole-stage
  * codegen emits one static call per row into the tight primitive-array
  * DP above — no fallback, no boxing. Null if either side is null. */
case class DamerauLevenshteinExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"damerau_levenshtein expects (string, string), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.distance(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DamerauLevenshtein$$.MODULE$$.distance($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Unicode NFC normalization (canonical composition) — the text-
  * canonicalization step a dedup pipeline must run BEFORE any hash:
  * 'é' and 'e'+COMBINING ACUTE are one grapheme in two byte encodings,
  * so un-normalized corpora hash visually identical documents apart.
  * Spark ships no normalizer; this wraps `java.text.Normalizer` (the
  * same Unicode 15 NFC tables DuckDB's `nfc_normalize` implements, so
  * outputs byte-match the oracle). Null in → null out. */
case class NfcNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.NfcNormalize$$.MODULE$$.normalize($a)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object NfcNormalize {
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: NFC-normalized input (the overwhelming case on clean
    // corpora) skips the rewrite entirely
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }
}

/** Jaro–Winkler similarity (Winkler 1990, public), the string-distance
  * the record-linkage literature standardized on for person/company
  * names: Jaro's windowed character matching with floor-halved
  * transpositions, boosted by up to 4 chars of common prefix when the
  * base similarity clears 0.7. Spark ships no Jaro family; blocking +
  * survivorship pipelines (our ER operators) need it as a codegen'd
  * primitive, not a UDF.
  *
  * Semantics are pinned to DuckDB's `jaro_winkler_similarity` so the
  * oracle hash-matches bit for bit (verified empirically against
  * DuckDB 1.x on matched/transposed/prefix/unicode probes):
  *  - operates on UTF-8 BYTES (multi-byte code points count per byte);
  *  - match window = max(|a|,|b|)/2 - 1 (integer division, floor 0);
  *  - transpositions t = (order mismatches among matched chars)/2,
  *    INTEGER division — the .5 remainder is dropped;
  *  - jaro = (m/|a| + m/|b| + (m-t)/m) / 3 in IEEE double, term order
  *    exactly as written;
  *  - winkler boost `j + 0.1·l·(1-j)` (l = common prefix ≤ 4 bytes)
  *    applied only when j > 0.7; both-empty or no-match → 0.0.
  */
object JaroWinkler {
  /** Matching is O(|a|·window) ≈ O(n²/2): a name/key primitive, not a
    * document metric — fail fast instead of burning a core on a 1 MiB
    * string (same stance as [[DamerauLevenshtein.MaxInputBytes]]). */
  val MaxInputBytes = 8192

  def similarity(a: UTF8String, b: UTF8String): Double = {
    val sa = a.getBytes
    val sb = b.getBytes
    val la = sa.length
    val lb = sb.length
    require(la <= MaxInputBytes && lb <= MaxInputBytes,
      s"jaro_winkler inputs capped at $MaxInputBytes bytes (got $la, " +
        s"$lb): windowed matching is O(|a|*|b|/2); pre-truncate keys")
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!bMatch(j) && sa(i) == sb(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // order mismatches among the matched subsequences, halved (floor)
    var mismatches = 0
    var bi = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(bi)) bi += 1
        if (sa(i) != sb(bi)) mismatches += 1
        bi += 1
      }
      i += 1
    }
    val t = mismatches / 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && sa(l) == sb(l)) l += 1
    jaro + 0.1 * l * (1.0 - jaro)
  }
}

/** `jaro_winkler(a, b)` as a native expression: whole-stage codegen
  * emits one static call per row. Null if either side is null. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler$$.MODULE$$.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object EditDistanceFunctions {
  def damerau_levenshtein(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DamerauLevenshteinExpr(GraftSqlBridge.expression(a),
        GraftSqlBridge.expression(b)))

  def jaro_winkler(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      JaroWinklerExpr(GraftSqlBridge.expression(a),
        GraftSqlBridge.expression(b)))

  def nfc_normalize(s: Column): Column =
    GraftSqlBridge.column(NfcNormalize(GraftSqlBridge.expression(s)))
}
