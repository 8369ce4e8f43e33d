package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of the engine's custom Catalyst expressions, two ways:
  *
  *  - [[GraftExtensions]]: a `SparkSessionExtensions` installer for
  *    `spark.sql.extensions=graft.functions.GraftExtensions` — the
  *    cluster-wide path.
  *  - [[GraftFunctions.register]]: imperative registration on a live
  *    session — the embedded/test path.
  *
  * Either way `SELECT vec_dot(a, b)` works from SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftFunctions.vecDotDescriptor)
    e.injectFunction(GraftFunctions.countInSetDescriptor)
    e.injectFunction(GraftFunctions.rollingHashDescriptor)
    e.injectFunction(GraftFunctions.distinctWGramCountDescriptor)
    e.injectFunction(GraftFunctions.hexBitSignsDescriptor)
    e.injectFunction(GraftFunctions.wordShinglesDescriptor)
    e.injectFunction(GraftFunctions.damerauLevenshteinDescriptor)
    e.injectFunction(GraftFunctions.jaroWinklerDescriptor)
    e.injectFunction(GraftFunctions.nfcNormalizeDescriptor)
    // transparent HOF → native-expression acceleration
    e.injectOptimizerRule(_ => graft.plans.CountInSetRewrite)
    // provable length pre-filter ahead of JW threshold matchers
    e.injectOptimizerRule(_ => graft.plans.JaroWinklerLengthPrune)
    // whole-operator path: the per-key top-k physical strategy
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}

object GraftFunctions {
  private[functions] val vecDotDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
    (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1)))

  /** SQL form: `count_in_set(arr, array('a','b'))` — the word set must
    * be an array of foldable strings (it becomes the static probe set). */
  private def mkCountInSet(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{CreateArray, Literal}
    val words = exprs(1) match {
      case CreateArray(items, _) if items.forall(_.foldable) =>
        items.map(_.eval(null)).collect {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        }
      case l: Literal if l.foldable =>
        l.eval(null) match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            a.toSeq[org.apache.spark.unsafe.types.UTF8String](StringTypeRef)
              .map(_.toString)
          case _ => Seq.empty
        }
      case _ => throw new IllegalArgumentException(
        "count_in_set: second argument must be a literal string array")
    }
    CountInSet(exprs(0), words)
  }

  private val StringTypeRef = org.apache.spark.sql.types.StringType

  private[functions] val countInSetDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("count_in_set"),
    new ExpressionInfo(classOf[CountInSet].getName, "count_in_set"),
    mkCountInSet _)

  private[functions] val rollingHashDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rolling_hash"),
    new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
    (exprs: Seq[Expression]) => RollingHash(exprs(0)))

  /** SQL forms of the remaining two native expressions; the int
    * parameters must be literals (they specialize the generated code). */
  private def litInt(e: Expression, name: String): Int = e match {
    case l if l.foldable => l.eval(null) match {
      case i: Integer => i.intValue
      case i: java.lang.Long => i.intValue
      case other => throw new IllegalArgumentException(
        s"$name: expected an integer literal, got $other")
    }
    case _ => throw new IllegalArgumentException(
      s"$name: parameter must be a literal")
  }

  private[functions] val distinctWGramCountDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("distinct_wgram_count"),
    new ExpressionInfo(classOf[DistinctWGramCount].getName,
      "distinct_wgram_count"),
    (exprs: Seq[Expression]) => DistinctWGramCount(exprs(0),
      litInt(exprs(1), "distinct_wgram_count")))

  private[functions] val hexBitSignsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hex_bit_signs"),
    new ExpressionInfo(classOf[HexBitSigns].getName, "hex_bit_signs"),
    (exprs: Seq[Expression]) => HexBitSigns(exprs(0),
      litInt(exprs(1), "hex_bit_signs")))

  private[functions] val wordShinglesDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_shingles"),
    new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
    (exprs: Seq[Expression]) => WordShingles(exprs(0),
      litInt(exprs(1), "word_shingles")))

  private[functions] val damerauLevenshteinDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("damerau_levenshtein"),
    new ExpressionInfo(classOf[DamerauLevenshteinExpr].getName,
      "damerau_levenshtein"),
    (exprs: Seq[Expression]) => DamerauLevenshteinExpr(exprs(0), exprs(1)))

  private[functions] val jaroWinklerDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinklerExpr].getName, "jaro_winkler"),
    (exprs: Seq[Expression]) => JaroWinklerExpr(exprs(0), exprs(1)))

  private[functions] val nfcNormalizeDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (exprs: Seq[Expression]) => NfcNormalize(exprs(0)))

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "count_in_set", mkCountInSet, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs(0)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "distinct_wgram_count", exprs => DistinctWGramCount(exprs(0),
        litInt(exprs(1), "distinct_wgram_count")), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hex_bit_signs", exprs => HexBitSigns(exprs(0),
        litInt(exprs(1), "hex_bit_signs")), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles", exprs => WordShingles(exprs(0),
        litInt(exprs(1), "word_shingles")), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "damerau_levenshtein",
      exprs => DamerauLevenshteinExpr(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler",
      exprs => JaroWinklerExpr(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs(0)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hilbert_index", exprs => HilbertIndex(exprs(0), exprs(1),
        litInt(exprs(2), "hilbert_index")), "scala_udf")
    // idempotent: replace, never append twice
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ == graft.plans.CountInSetRewrite)
        .filterNot(_ == graft.plans.JaroWinklerLengthPrune) :+
        graft.plans.CountInSetRewrite :+
        graft.plans.JaroWinklerLengthPrune
  }
}
