package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Source lint making the repo's single-partition-window ban
  * mechanical: every `Window.orderBy(...)` in `src/main` (the
  * partition-FREE spelling — a `Window.partitionBy(...).orderBy(...)`
  * never matches this token) must be on the documented bounded-bucket
  * allowlist below. A global window serializes the whole relation
  * through one task; the only admissible uses are windows over
  * relations whose cardinality is bounded by construction (a fixed
  * bucket count, a group count, a calendar) — never by corpus size.
  *
  * Adding a new site = adding an allowlist entry HERE with its bound,
  * which is exactly the review moment the lint exists to force.
  */
class WindowDisciplineLintSpec extends AnyFunSuite {

  /** file basename -> (expected site count, the documented bound) */
  private val allowlist: Map[String, (Int, String)] = Map(
    "RelationalOps.scala" -> (2 ->
      "distributedPrefixSum bucket windows: rows = fixed bucket count"),
    "PipelineOps.scala" -> (2 ->
      "largest-remainder seats (rows = #groups) + bucket prefix sum"),
    "AnalyticsOps.scala" -> (4 ->
      ("equi-depth bucket ranks, Lorenz buckets, BM25/RRF top-k over " +
        "pre-limited relations (rows = #buckets or bounded k)")))

  test("every partition-free Window.orderBy in src/main is on the " +
      "bounded-bucket allowlist (and the list stays <= 8 sites)") {
    val root = Paths.get("src/main/scala")
    assert(Files.isDirectory(root), s"run from the repo root: $root")
    val pattern = raw"Window\s*\.\s*orderBy".r
    val sites: Seq[(String, Int)] = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .flatMap { p =>
        val lines = Files.readAllLines(p).asScala
        lines.zipWithIndex.collect {
          case (l, i) if pattern.findFirstIn(l).isDefined =>
            (p.getFileName.toString, i + 1)
        }
      }.toSeq

    val byFile = sites.groupBy(_._1).view.mapValues(_.size).toMap
    val unexpected = byFile.filterNot { case (f, n) =>
      allowlist.get(f).exists(_._1 == n)
    }
    assert(unexpected.isEmpty,
      s"partition-free Window.orderBy sites off the allowlist (add a " +
        s"documented bound or use distributedPrefixSum): " +
        s"$unexpected; all sites: ${sites.sortBy(identity)}")
    // files on the allowlist must still carry their sites (stale
    // entries get pruned, keeping the list honest)
    val stale = allowlist.keys.filterNot(byFile.contains)
    assert(stale.isEmpty, s"stale allowlist entries: $stale")
    assert(sites.size <= 8,
      s"allowlisted global-window budget is 8 sites, found " +
        s"${sites.size}: ${sites.sortBy(identity)}")
  }
}
