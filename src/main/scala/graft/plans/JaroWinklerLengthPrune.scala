package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.JaroWinklerExpr

/** Optimizer rule: in front of an expensive Jaro–Winkler threshold
  * filter `jaro_winkler(a, b) >= t` with t > 0.8, conjoin the CHEAP
  * implied length guard
  *
  *   least(length(a), length(b)) >= (5t − 4) · greatest(length(a), length(b))
  *
  * Soundness (so the guard can never change results): with byte
  * lengths s = min(|a|,|b|), L = max(|a|,|b|), matches m ≤ s, so
  * jaro ≤ (s/L + 2)/3, and the Winkler boost is capped at 4 prefix
  * chars: jw ≤ jaro + 0.4·(1 − jaro) = 0.6·jaro + 0.4 ≤ 0.2·(s/L) + 0.8.
  * Hence jw ≥ t ⇒ s/L ≥ 5t − 4 — for t ≤ 0.8 the bound is vacuous and
  * the rule leaves the filter alone.
  *
  * Why it matters at scale: the JW kernel is O(s·window) per pair; the
  * guard is two `length` calls and a multiply, evaluated BEFORE the
  * kernel by conjunct short-circuiting. In a blocked ER join at a 0.9
  * threshold this discards every candidate pair whose lengths differ
  * by more than 2× without ever running the matcher — the classic
  * length filter of the similarity-join literature (PPJoin et al.),
  * applied transparently by the engine.
  *
  * Idempotence: the guard's structure (a comparison whose right side
  * is `(5t−4) · greatest(...)`) is checked for structural presence in
  * the filter's conjuncts before injecting, so the fixpoint optimizer
  * cannot stack copies.
  *
  * Interaction with the kernel's MaxInputBytes fail-fast: the guard is
  * prepended, so conjunct short-circuiting means an oversized string
  * (> 8192 bytes) whose pair FAILS the length guard is filtered out
  * without the kernel ever running — the `require` that would have
  * thrown never fires. This is intentional: the fail-fast is a
  * performance tripwire ("don't burn a core on a 1 MiB key"), not a
  * data-validation contract, and a pruned pair is by the soundness
  * proof a non-match, so results are unchanged. Pairs that PASS the
  * guard still reach the kernel and still fail fast if oversized. */
object JaroWinklerLengthPrune extends Rule[LogicalPlan] {

  private def guardFor(jw: JaroWinklerExpr, t: Double): Expression = {
    val ratio = 5.0 * t - 4.0
    // OctetLength (UTF-8 BYTES), not Length (characters): the kernel in
    // graft.functions.JaroWinkler matches per byte, so the 5t−4 bound is
    // proved over byte lengths. A char-count guard is UNSOUND on
    // multi-byte data: jw('ééééxxxxxx','ééééxxx') = 0.9571 ≥ 0.95 but
    // the char ratio 7/10 < 0.75 would wrongly prune it (byte ratio
    // 11/14 ≥ 0.75 keeps it).
    GreaterThanOrEqual(
      Cast(Least(Seq(OctetLength(jw.left), OctetLength(jw.right))),
        DoubleType),
      Multiply(Literal(ratio),
        Cast(Greatest(Seq(OctetLength(jw.left), OctetLength(jw.right))),
          DoubleType)))
  }

  private def thresholdOf(cond: Expression)
      : Option[(JaroWinklerExpr, Double)] = cond match {
    case GreaterThanOrEqual(jw: JaroWinklerExpr, Literal(t: Double, DoubleType))
        if t > 0.8 => Some((jw, t))
    case GreaterThan(jw: JaroWinklerExpr, Literal(t: Double, DoubleType))
        if t > 0.8 => Some((jw, t))
    case LessThanOrEqual(Literal(t: Double, DoubleType), jw: JaroWinklerExpr)
        if t > 0.8 => Some((jw, t))
    case LessThan(Literal(t: Double, DoubleType), jw: JaroWinklerExpr)
        if t > 0.8 => Some((jw, t))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val guards = conjuncts.flatMap(thresholdOf).map {
        case (jw, t) => guardFor(jw, t)
      }
      val missing = guards.filterNot(g =>
        conjuncts.exists(_.semanticEquals(g)))
      if (missing.isEmpty) f
      else Filter((missing ++ conjuncts).reduce(And), child)
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] =
    e match {
      case And(l, r) =>
        splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }
}
