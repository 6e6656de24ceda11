package graft

/** Generator for `REGISTRY.md` — the one-page index of every registry
  * entry: name, gate type, where the query is registered and defined,
  * and which library operator its definition leads with. 198 entries
  * across three query files had outgrown prose (SURVEY §8); this table
  * is DERIVED from [[SparkEntry.queries]] / [[SparkEntry.oracleSql]] /
  * [[SparkEntry.rowsOnlyGate]] plus a scan of the query sources, and
  * RegistryGuardSpec pins the committed file to [[render]]'s output,
  * so it can never drift from the code (the README-count discipline).
  *
  * Run `sbt "runMain graft.RegistryDoc"` from the repo root to
  * regenerate after adding an entry.
  */
object RegistryDoc {

  private val querySources = Seq(
    "src/main/scala/graft/queries/RelationalQueries.scala",
    "src/main/scala/graft/queries/MlQueries.scala",
    "src/main/scala/graft/queries/StatsQueries.scala")

  /** Library objects whose first appearance in a query body names the
    * operator under test (registry plumbing objects excluded).
    */
  private val operatorOwners =
    "Dedup|Similarity|Corpus|Retrieval|TextAnalysis|Classify|" +
      "Multimodal|Bpe|SetSimJoin|Versioning|Catalog|CleanFields|" +
      "CdcPipeline|RangeJoin|AsOfJoin|Telemetry|Layout|Graph|" +
      "StreamingAgg|StreamingSessionize|SubstrIngest|VectorIngest|" +
      "Bm25Ingest|CorpusIngest|StreamingNearDup|BloomFilter"

  private case class Site(file: String, line: Int, valName: String,
      operator: String)

  /** Scan the query sources for each registry key's map binding
    * (`"name" -> valName`), its `val` definition site, and the first
    * operator call in the definition body.
    */
  private def sites(): Map[String, Site] = {
    val bind = ("\"([a-zA-Z0-9_]+)\" -> ([A-Za-z0-9]+),?\\s*$").r
    val opRe = (s"($operatorOwners)\\.([a-zA-Z0-9]+)").r
    val perFile = querySources.map { f =>
      val lines = scala.io.Source.fromFile(f, "UTF-8").getLines().toVector
      (f, lines)
    }
    // valName -> (file, line, operator) from the `val X: Q =` sites
    val defs = perFile.flatMap { case (f, lines) =>
      lines.zipWithIndex.collect {
        case (l, i) if l.startsWith("  val ") && l.contains(": Q") =>
          val name = l.trim.stripPrefix("val ").takeWhile(_ != ':')
          // first operator call within the definition's body: stop at
          // the next TOP-LEVEL val or its scaladoc (locals are
          // indented deeper), and drop comment lines so a mention in
          // prose can never be reported as the operator
          val body = lines.slice(i, math.min(i + 60, lines.length))
            .takeWhile(b => !(b.startsWith("  val ") && b != l)
              && !b.startsWith("  /**"))
            .filterNot { b =>
              val t = b.trim
              t.startsWith("*") || t.startsWith("/*") ||
                t.startsWith("//")
            }
            .mkString("\n")
          val op = opRe.findFirstMatchIn(body)
            .map(m => s"${m.group(1)}.${m.group(2)}")
            .getOrElse("inline plan")
          name -> (f.split('/').last, i + 1, op)
      }
    }.toMap
    perFile.flatMap { case (f, lines) =>
      lines.zipWithIndex.flatMap { case (l, i) =>
        bind.findFirstMatchIn(l).flatMap { m =>
          val (qName, valName) = (m.group(1), m.group(2))
          defs.get(valName).map { case (df, dl, op) =>
            qName -> Site(s"$df:$dl", i + 1, valName, op)
          }
        }
      }
    }.toMap
  }

  def render(): String = {
    val gates = SparkEntry.rowsOnlyGate
    val oracles = SparkEntry.oracleSql
    val s = sites()
    val rows = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val gate =
        if (oracles.contains(name)) "oracle"
        else gates.getOrElse(name, "MISSING-GATE")
      val site = s.get(name)
      val where = site.map(_.file).getOrElse("?")
      val op = site.map(_.operator).getOrElse("?")
      s"| `$name` | $gate | $op | $where |"
    }
    val nOracle = SparkEntry.queries.keys.count(oracles.contains)
    // no stripMargin here: the table rows themselves begin with `|`
    "# Registry index (generated — do not edit)\n\n" +
      "Regenerate with `sbt \"runMain graft.RegistryDoc\"`; the\n" +
      "RegistryGuardSpec pins this file to the generator's output.\n\n" +
      s"${SparkEntry.queries.size} entries, $nOracle " +
      "DuckDB-oracle-gated,\n" +
      s"${SparkEntry.queries.size - nOracle} rows-only (each with a " +
      "declared\ngate — see SparkEntry.rowsOnlyGate).\n\n" +
      "| entry | gate | operator | defined at |\n" +
      "| --- | --- | --- | --- |\n" +
      rows.mkString("\n") + "\n"
  }

  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get("REGISTRY.md")
    java.nio.file.Files.write(out,
      render().getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote $out")
  }
}
