package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants for the aggregated registries. `SparkEntry`
  * concatenates eight per-module Maps with `++`, which silently OVERRIDES on
  * a duplicate key — a name collision between two modules would drop an
  * operator from the gate without any failure. These checks make that loud. */
class SparkEntrySuite extends AnyFunSuite {

  private val registries = Seq(
    "Relational" -> operators.Relational.queries.keySet,
    "TextAnalysis" -> operators.TextAnalysis.queries.keySet,
    "Dedup" -> operators.Dedup.queries.keySet,
    "Similarity" -> operators.Similarity.queries.keySet,
    "Multimodal" -> operators.Multimodal.queries.keySet,
    "Pipeline" -> operators.Pipeline.queries.keySet,
    "SourceFormats" -> sources.SourceFormats.queries.keySet,
    "StreamingQueries" -> streaming.StreamingQueries.queries.keySet)

  test("no query name collides across module registries") {
    val all = registries.flatMap { case (m, ks) => ks.map(_ -> m) }
    val dupes = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dupes.isEmpty,
      s"colliding gate names: ${dupes.map { case (k, ms) => s"$k in ${ms.map(_._2).mkString("+")}" }.mkString("; ")}")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle references a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("rows-only entries are the one designed exception") {
    // q9_distinct_approx graduated to a full oracle in round 7 (2% tolerance
    // flag); only the non-deterministic streaming limit remains rows-only.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("stream_limit"),
      s"unexpected rows-only (weaker-checked) gate entries: $rowsOnly")
  }
}
