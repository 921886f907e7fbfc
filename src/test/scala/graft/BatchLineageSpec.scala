package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical regression net for the streaming sinks' checkpoint-lineage
  * guards: every `__batch=$batchId`-writing batch body must call
  * `requireBatchLineage` for EVERY root it writes, before any landing.
  * The round-12/13 finding this pins: packBatch and postingsStream each
  * guarded only one of their two roots, so a crash between the writes
  * left the unguarded root one batch ahead — a foreign-checkpoint
  * restart would march forward and silently overwrite the orphaned
  * delta. The registry below enumerates each sink's write roots; the
  * source checks make a NEW root (or a new sink) fail this spec until
  * it is both guarded and registered. */
class BatchLineageSpec extends AnyFunSuite {

  private val src = new String(java.nio.file.Files.readAllBytes(
    java.nio.file.Paths.get("src/main/scala/graft/streaming/StreamingOps.scala")),
    java.nio.charset.StandardCharsets.UTF_8)

  /** sink body name -> (distinct `__batch=$batchId` write-root count,
    * tokens that must appear in the guard region — the comment-stripped
    * body text BEFORE the first write site). Tokens are the root
    * expressions as they appear inside requireBatchLineage calls (or the
    * Seq feeding one), so a guard dropped or moved below a write fails. */
  private val Registry: Map[String, (Int, Seq[String])] = Map(
    "curatedBatch" -> (2, Seq("idxPath", "s\"$outDir/docs\"")),
    "ivfBatch" -> (1, Seq("requireBatchLineage(f, p, batchId")),
    "knnGraphBatch" -> (2, Seq("Seq(corpusDir, edgesDir)")),
    "pqBatch" -> (1, Seq("requireBatchLineage(f, p, batchId")),
    "sq8Batch" -> (1, Seq("requireBatchLineage(f, p, batchId")),
    "postingsBatch" -> (2,
      Seq("requireBatchLineage(f, p, batchId", "s\"$path/_docs\"")),
    "packBatch" -> (2, Seq("spansRoot, batchId", "offRoot, batchId")),
    "storeBatch" -> (2, Seq("recipesRoot, batchId", "s\"$path/chunks\"")),
    "lshBatch" -> (1, Seq("requireBatchLineage(f, p, batchId")),
    "phashBatch" -> (1, Seq("requireBatchLineage(f, p, batchId")),
    "shingleBatch" -> (1, Seq("requireBatchLineage(f, p, batchId")),
    "knBatch" -> (2, Seq("Seq(uniRoot, pairsRoot)")),
    "kn3Batch" -> (2, Seq("Seq(uniRoot, triRoot)")),
    "nbBatch" -> (2, Seq("Seq(ncwRoot, clsRoot)")),
    // _sums + the mode-dependent _keys/_hll twin: three textual write
    // sites, guarded as Seq("_sums", keysSub)
    "cardBatch" -> (3, Seq("\"_sums\"", "keysSub")),
    // _sums, _chunkkeys, _media, _dup written here; the _phidx frame
    // level lands via phashBatch (which guards its own root first)
    "mediaCardBatch" -> (4,
      Seq("Seq(\"_sums\", \"_chunkkeys\", \"_media\", \"_dup\")")),
    "topkBatch" -> (1, Seq("requireBatchLineage(f, p, batchId")),
    "quantileBatch" -> (1, Seq("requireBatchLineage(f, p, batchId")),
    "budgetBatch" -> (2, Seq("Seq(\"docs\", \"_totals\")")),
    // _pairs, _assign, docs written here; _lsh written via lshBatch
    // (which re-guards its own root) but guarded HERE too, before the
    // earlier landings
    "clusterBatch" -> (3,
      Seq("Seq(s\"$outDir/_pairs\", s\"$outDir/_assign\", lshDir, docsDir)")),
    // the shared core of manifestBatch/curriculumBatch — the global-
    // schedule maintainers' writes live here
    "scheduleBatch" -> (2, Seq("Seq(docsRoot, manifestRoot)")),
    "bloomBatch" -> (1, Seq("requireBatchLineage(f, p, batchId")),
    "kmeansBatch" -> (1, Seq("requireBatchLineage(f, p, batchId")))

  /** Split the source at two-space-indented def headers; a body is the
    * text from its header to the next header. */
  private val bodies: Map[String, String] = {
    val defHdr = """(?m)^  (?:private(?:\[graft\])? )?def (\w+)[\(\[]""".r
    val ms = defHdr.findAllMatchIn(src).toVector
    ms.zipWithIndex.map { case (m, i) =>
      val end = if (i + 1 < ms.size) ms(i + 1).start else src.length
      m.group(1) -> src.substring(m.start, end)
    }.toMap
  }

  private def stripComments(body: String): String =
    body.linesIterator
      .map(l => l.indexOf("//") match {
        case -1 => l
        case i => l.substring(0, i)
      })
      .filterNot(l => l.trim.startsWith("*") || l.trim.startsWith("/**"))
      .mkString("\n")

  private val WriteSite = java.util.regex.Pattern.quote("__batch=$batchId")
  private def sinks: Map[String, String] =
    bodies.filter { case (_, b) => b.contains("__batch=$batchId") }

  test("every __batch-writing sink is registered") {
    assert(sinks.keySet == Registry.keySet,
      s"unregistered or stale sinks: ${(sinks.keySet diff Registry.keySet) ++
        (Registry.keySet diff sinks.keySet)} — register the sink's write " +
        "roots here AND guard each with requireBatchLineage")
  }

  test("write-root counts match the registry (a new root must be registered)") {
    // distinct write prefixes: the interpolated path up to /__batch=$batchId,
    // plus the Path(x, s"__batch=$batchId/...") form (bloomBatch)
    val prefixed = ("""([\w$."{}/]+)/""" + WriteSite).r
    val pathForm = ("""Path\((\w+), s?"""" + WriteSite).r
    for ((name, body) <- sinks) {
      val roots = prefixed.findAllMatchIn(body).map(_.group(1)).toSet ++
        pathForm.findAllMatchIn(body).map(_.group(1)).toSet
      assert(roots.size == Registry(name)._1,
        s"$name writes roots $roots but the registry expects " +
          s"${Registry(name)._1} — update BOTH the guards and this registry")
    }
  }

  test("every registered root is guarded before the first write") {
    for ((name, body) <- sinks) {
      val clean = stripComments(body)
      val firstWrite = clean.indexOf("__batch=$batchId")
      assert(firstWrite >= 0, s"$name: write site vanished")
      val guardRegion = clean.substring(0, firstWrite)
      assert(guardRegion.contains("requireBatchLineage"),
        s"$name: no requireBatchLineage before the first write")
      for (tok <- Registry(name)._2)
        assert(guardRegion.contains(tok),
          s"$name: guard token `$tok` not found before the first write — " +
            "every root the batch writes needs its own lineage guard")
    }
  }
}
