package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared integer-parameter `_meta.json` sidecar for persisted indexes:
  * a probe signed with different parameters than the index silently
  * yields missing candidates (wrong bands, wrong buckets), so writers
  * record the parameters and probes assert them — loud refusal instead
  * of a silent miss. One implementation serves every index family
  * (the LSH and pHash sidecars delegate here); the streaming schedule
  * sinks keep their own long-typed variant (IEEE-bit-pinned doubles
  * don't fit an int sidecar). */
private[graft] object ParamMeta {

  /** Write (or overwrite) the sidecar. Writers decide the crash-window
    * ordering themselves: sinks with a separate data subdirectory write
    * meta BEFORE data so a crash between the two fails loudly at read
    * time; see writePhashIndex for the reasoning. */
  def write(spark: SparkSession, path: String,
      fields: Seq[(String, Int)]): Unit = {
    val meta = new org.apache.hadoop.fs.Path(path, "_meta.json")
    val f = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(meta, true)
    try out.write(
      fields.map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}").getBytes("UTF-8"))
    finally out.close()
  }

  /** Assert the caller's parameters against the sidecar (no-op when the
    * sidecar is absent — pre-sidecar indexes). `what` names the
    * parameter family and `rebuildHint` the writer, so the refusal
    * message tells the operator exactly what to do. */
  def assertMatches(spark: SparkSession, path: String,
      fields: Seq[(String, Int)], what: String, rebuildHint: String): Unit = {
    val meta = new org.apache.hadoop.fs.Path(path, "_meta.json")
    val mf = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (mf.exists(meta)) {
      val in = mf.open(meta)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      def field(key: String): Option[Int] =
        s""""$key":(-?\\d+)""".r.findFirstMatchIn(text).map(_.group(1).toInt)
      val mismatches = fields.flatMap { case (key, v) =>
        field(key).filter(_ != v).map(rec => s"$key: index=$rec probe=$v")
      }
      require(mismatches.isEmpty,
        s"$what disagree with the index at $path " +
          s"(${mismatches.mkString(", ")}) — probe with the index's parameters " +
          s"or rebuild it with $rebuildHint")
    }
  }
}
