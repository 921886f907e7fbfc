package graft.sources

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Object-store-durable delete/compaction for the bucketed events layout
  * (SURVEY.md §2 A5; reference `CassandraEventStore.cs:126-146`, whose
  * DELETE is durable because Cassandra owns the storage engine).
  *
  * `Storage.deleteAndRewrite` overwrites bucket partitions in place — safe
  * on HDFS-style filesystems, not on object stores (no atomic directory
  * replace; a failed rewrite leaves a half-deleted bucket). This layer is
  * the object-store path: data is IMMUTABLE once written, organized as
  * generation directories under one table root, and the only mutation is
  * an atomic swap of a small `_CURRENT` manifest:
  *
  * {{{
  *   root/_CURRENT            # "<bucket>\t<generation dir>" per bucket
  *   root/g-00000001/bucket=0/...parquet   # never modified after write
  *   root/g-00000002/bucket=7/...parquet   # rewrite of bucket 7 only
  * }}}
  *
  * A delete rewrites ONLY the affected buckets into a fresh generation
  * directory (O(affected slice) I/O, not O(table)) and points those
  * buckets' manifest entries at it; untouched buckets keep referencing
  * their old generation — no data copy, no rename of data files. Readers
  * that resolved the previous manifest keep reading intact files; the old
  * generation stays on disk until `vacuum`. The manifest write is a
  * write-temp + atomic-rename (an atomic small-object PUT on object
  * stores), so a crash anywhere leaves either the old or the new manifest,
  * never a torn table.
  *
  * Single-writer per table root (matching the reference's per-partition
  * writer); concurrent readers are always safe. Upgrading to concurrent
  * writers needs exactly one primitive this layer deliberately leaves to
  * the deployment: a compare-and-swap publish of `_CURRENT` (HDFS: create
  * + rename without OVERWRITE; S3-style stores: conditional PUT on the
  * manifest's ETag) — generation directories are already write-once and
  * collision-free under racing writers, only the pointer swap races.
  *
  * Every promote also appends an immutable snapshot under `_manifests/`,
  * giving MVCC time travel: `readAt(root, v)` reads the table exactly as
  * of promote `v` for as long as `vacuum` has not dropped the generations
  * that version references (the retention window is the caller's policy).
  */
object Generations {

  val ManifestFile = "_CURRENT"

  val ManifestDir = "_manifests"

  /** bucket -> generation directory name (relative to the table root). */
  final case class Manifest(entries: Map[Int, String]) {
    def generations: Set[String] = entries.values.toSet
  }

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def parseManifest(text: String): Manifest =
    Manifest(text.linesIterator.filter(_.nonEmpty).map { line =>
      val Array(b, g) = line.split('\t')
      b.toInt -> g
    }.toMap)

  private def readManifestFile(f: FileSystem, p: Path): Option[Manifest] =
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      Some(parseManifest(text))
    }

  /** Read the current manifest; None if the table has no promoted data. */
  def readManifest(spark: SparkSession, root: String): Option[Manifest] =
    readManifestFile(fs(spark, root), new Path(root, ManifestFile))

  /** Atomically publish a manifest: write to a temp name, then rename over
    * `_CURRENT` (FileContext rename with OVERWRITE — atomic on HDFS and
    * local; the object-store translation is an atomic PUT of one small
    * object). This is the ONLY mutation the layout ever performs. */
  def writeManifest(spark: SparkSession, root: String, m: Manifest): Unit = {
    val f = fs(spark, root)
    f.mkdirs(new Path(root))
    val body = m.entries.toSeq.sortBy(_._1)
      .map { case (b, g) => s"$b\t$g" }.mkString("", "\n", "\n")
      .getBytes("UTF-8")
    // history snapshot FIRST (write-once, never renamed-over): a crash
    // between the two writes leaves a snapshot that never became current —
    // harmless for time travel, since the data generations it references
    // were fully written before any promote attempt
    f.mkdirs(new Path(root, ManifestDir))
    val version = manifestVersions(spark, root).lastOption.getOrElse(0) + 1
    val snap = f.create(new Path(root, f"$ManifestDir/m-$version%08d"), false)
    try snap.write(body) finally snap.close()
    val tmp = new Path(root, s"$ManifestFile.tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(body) finally out.close()
    FileContext.getFileContext(f.getUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, new Path(root, ManifestFile), Options.Rename.OVERWRITE)
  }

  private val SnapName = "m-(\\d+)".r

  /** Promote versions with a retained snapshot, ascending. */
  def manifestVersions(spark: SparkSession, root: String): Seq[Int] = {
    val f = fs(spark, root)
    val d = new Path(root, ManifestDir)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).map(_.getPath.getName)
      .flatMap { case SnapName(v) => v.toIntOption; case _ => None }
      .toSeq.sorted
  }

  /** The manifest as of promote `version`; None if that promote never
    * happened (or its snapshot was pruned). */
  def readManifestAt(spark: SparkSession, root: String, version: Int): Option[Manifest] =
    readManifestFile(fs(spark, root), new Path(root, f"$ManifestDir/m-$version%08d"))

  /** A generation directory name this layout wrote: `g-` + digits. Foreign
    * `g-*` entries a user drops under the root (e.g. `g-backup`) must be
    * ignored everywhere — parsed here, and never vacuumed. */
  private val GenName = "g-(\\d+)".r

  private def genNumber(name: String): Option[Int] =
    name match { case GenName(d) => d.toIntOption; case _ => None }

  /** Next unused generation directory name (monotonic counter over existing
    * `g-*` dirs; single-writer by contract, so no CAS is needed). */
  def nextGeneration(spark: SparkSession, root: String): String = {
    val f = fs(spark, root)
    val p = new Path(root)
    val existing =
      if (!f.exists(p)) Array.empty[Int]
      else f.listStatus(p).map(_.getPath.getName).flatMap(genNumber)
    f"g-${(if (existing.isEmpty) 0 else existing.max) + 1}%08d"
  }

  /** Bootstrap: land `rows` (canonical event columns) as generation 1 and
    * promote every written bucket. */
  def bootstrap(
      spark: SparkSession, root: String, rows: DataFrame,
      nBuckets: Int = Storage.DefaultBuckets): Unit = {
    val gen = nextGeneration(spark, root)
    Storage.appendEvents(rows, s"$root/$gen", nBuckets)
    val buckets = spark.read.parquet(s"$root/$gen")
      .select(col("bucket")).distinct().collect().map(_.getInt(0))
    writeManifest(spark, root, Manifest(buckets.map(_ -> gen).toMap))
  }

  /** Resolve + read the current table state: each bucket from the
    * generation that owns it. Per-generation reads keep `basePath`, so the
    * `bucket` partition column (and its directory pruning) survive. */
  def readCurrent(spark: SparkSession, root: String): DataFrame = {
    val m = readManifest(spark, root).getOrElse(
      sys.error(s"Generations.readCurrent: no $ManifestFile under $root"))
    require(m.entries.nonEmpty, s"Generations.readCurrent: $root is empty (all buckets deleted)")
    resolve(spark, root, m)
  }

  /** Time travel: the table exactly as of promote `version`. Valid while
    * the generations that version references survive `vacuum` (vacuum
    * retains only what the CURRENT manifest references — an old version's
    * read fails once its generations are dropped, like any MVCC snapshot
    * outside the retention window). */
  def readAt(spark: SparkSession, root: String, version: Int): DataFrame = {
    val m = readManifestAt(spark, root, version).getOrElse(
      sys.error(s"Generations.readAt: no promote v$version under $root"))
    require(m.entries.nonEmpty, s"Generations.readAt: v$version is empty (all buckets deleted)")
    resolve(spark, root, m)
  }

  /** Each bucket from the generation that owns it. Per-generation reads
    * keep `basePath`, so the `bucket` partition column (and its directory
    * pruning) survive. */
  private def resolve(spark: SparkSession, root: String, m: Manifest): DataFrame =
    m.entries.groupBy(_._2).toSeq.sortBy(_._1).map { case (gen, es) =>
      spark.read.option("basePath", s"$root/$gen")
        .parquet(es.keys.toSeq.sorted.map(b => s"$root/$gen/bucket=$b"): _*)
    }.reduce(_ unionByName _)

  /** A5, object-store flavor: anti-join the tombstones against ONLY the
    * affected buckets, write survivors to a fresh generation, atomically
    * repoint those buckets. Untouched buckets are not read, not copied,
    * not renamed; a fully-tombstoned bucket simply leaves the manifest.
    * Returns the new generation name (for audit), or None if no manifested
    * bucket was affected. */
  def deleteAndPromote(
      spark: SparkSession, root: String, tombstones: DataFrame,
      nBuckets: Int = Storage.DefaultBuckets): Option[String] = {
    val m = readManifest(spark, root).getOrElse(
      sys.error(s"Generations.deleteAndPromote: no $ManifestFile under $root"))
    // derive affected buckets DISTRIBUTED (the same xxhash64 expression the
    // writer used): the collect is bounded by nBuckets, not by the
    // tombstone frame, which at 100 TB may itself be huge
    val affected = tombstones
      .select(pmod(xxhash64(col("id")), lit(nBuckets)).cast("int").as("bucket"))
      .distinct().collect().map(_.getInt(0)).toSeq
      .filter(m.entries.contains).sorted
    if (affected.isEmpty) return None
    val slices = affected.map { b =>
      spark.read.option("basePath", s"$root/${m.entries(b)}")
        .parquet(s"$root/${m.entries(b)}/bucket=$b")
    }.reduce(_ unionByName _)
    // materialize before writing: the new generation is a fresh directory,
    // but the plan still reads the old one — cut it so the write job does
    // not re-list paths mid-flight
    val survivors = Storage.deleteEvents(slices, tombstones).localCheckpoint(true)
    val gen = nextGeneration(spark, root)
    survivors
      .repartition(col("bucket"))
      .sortWithinPartitions(col("id"), col("rev"), col("pos"))
      .write.mode(SaveMode.ErrorIfExists).partitionBy("bucket").parquet(s"$root/$gen")
    val survivorBuckets = survivors.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSet
    val entries = (m.entries -- affected) ++ survivorBuckets.map(_ -> gen)
    writeManifest(spark, root, Manifest(entries))
    Some(gen)
  }

  /** Compaction, object-store flavor (cf. `Storage.compact`): rewrite the
    * whole current state as one generation of few large sorted files per
    * bucket, then promote. Old generations remain for in-flight readers
    * until `vacuum`. */
  def compactAndPromote(spark: SparkSession, root: String): String = {
    val gen = nextGeneration(spark, root)
    readCurrent(spark, root)
      .repartition(col("bucket"))
      .sortWithinPartitions(col("id"), col("rev"), col("pos"))
      .write.mode(SaveMode.ErrorIfExists).partitionBy("bucket").parquet(s"$root/$gen")
    val buckets = spark.read.parquet(s"$root/$gen")
      .select(col("bucket")).distinct().collect().map(_.getInt(0))
    writeManifest(spark, root, Manifest(buckets.map(_ -> gen).toMap))
    gen
  }

  /** Drop generation directories no manifest entry references (run once
    * in-flight readers of old manifests have drained — the retention
    * window is the caller's policy, like any MVCC vacuum). */
  def vacuum(spark: SparkSession, root: String): Seq[String] = {
    val f = fs(spark, root)
    val live = readManifest(spark, root).map(_.generations).getOrElse(Set.empty)
    val dead = f.listStatus(new Path(root)).map(_.getPath.getName)
      .filter(n => genNumber(n).isDefined && !live.contains(n)).toSeq.sorted
    dead.foreach(n => f.delete(new Path(root, n), true): Unit)
    dead
  }
}
