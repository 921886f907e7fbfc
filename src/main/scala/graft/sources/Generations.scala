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
  * Concurrent writers are safe via optimistic concurrency on the manifest
  * LOG: the versioned snapshot `_manifests/m-<v>` is the commit point,
  * published by write-temp + rename-WITHOUT-overwrite — exactly one writer
  * can create a given version (atomic on HDFS; the object-store
  * translation is a conditional PUT / if-none-match on the snapshot key).
  * A loser gets a retryable [[ManifestConflictException]] and must re-read
  * state before retrying (its generation directory is write-once and
  * collision-free, so nothing it wrote needs undoing — it is simply
  * unreferenced and vacuumable). `_CURRENT` is a convergent CACHE of the
  * newest snapshot, refreshed after each commit with rename-OVERWRITE;
  * readers resolve the max snapshot version and fall back to `_CURRENT`
  * only for legacy roots with no `_manifests/` log. This mirrors the
  * multi-writer safety the reference gets from Cassandra's per-partition
  * atomic batches (`CassandraEventStore.cs:67-70`).
  *
  * Every promote appends an immutable snapshot under `_manifests/`,
  * giving MVCC time travel: `readAt(root, v)` reads the table exactly as
  * of promote `v` for as long as `vacuum(keepVersions = n)` has retained
  * that snapshot — vacuum prunes old snapshots TOGETHER with the
  * generations only they reference, so a retained version always reads
  * and a pruned one fails fast at manifest resolution (never with a
  * missing-path crash mid-scan).
  */
/** A promote lost the compare-and-swap on the manifest log: another writer
  * committed the same version first. Retryable — re-read the table state
  * (the conflicting writer's changes included) and promote again. */
class ManifestConflictException(message: String, cause: Throwable = null)
    extends java.io.IOException(message, cause)

object Generations {

  val ManifestFile = "_CURRENT"

  val ManifestDir = "_manifests"

  /** bucket -> generation directory name (relative to the table root). */
  final case class Manifest(entries: Map[Int, String]) {
    def generations: Set[String] = entries.values.toSet
  }

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // '#' lines are writer-provenance comments (unique per promote attempt —
  // the local-FS TOCTOU guard in `promote` compares full snapshot bytes)
  private def parseManifest(text: String): Manifest =
    Manifest(text.linesIterator.filter(l => l.nonEmpty && !l.startsWith("#")).map { line =>
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

  /** Newest committed promote version; 0 if the log is empty (fresh table
    * or legacy `_CURRENT`-only root). */
  def currentVersion(spark: SparkSession, root: String): Int =
    manifestVersions(spark, root).lastOption.getOrElse(0)

  /** Read the current manifest: the newest snapshot in the manifest log;
    * for legacy roots with no log, the `_CURRENT` cache. None if the table
    * has no promoted data. */
  def readManifest(spark: SparkSession, root: String): Option[Manifest] = {
    val f = fs(spark, root)
    manifestVersions(spark, root).lastOption match {
      case Some(v) => readManifestFile(f, new Path(root, f"$ManifestDir/m-$v%08d"))
      case None    => readManifestFile(f, new Path(root, ManifestFile))
    }
  }

  /** Compare-and-swap publish: commit `m` as version `expectedVersion + 1`,
    * failing with a retryable [[ManifestConflictException]] if any other
    * writer committed since the caller read `expectedVersion`
    * ([[currentVersion]]). The commit point is an atomic create-if-absent
    * of the versioned snapshot: rename-WITHOUT-overwrite on HDFS (atomic
    * under the namenode lock; object stores swap in a conditional PUT on
    * the snapshot key), hard-link on local filesystems (where Hadoop's
    * no-overwrite rename is check-then-act). A post-commit read-back
    * additionally verifies the winner's bytes survived on schemes with
    * weaker rename guarantees. Returns the committed version. */
  def promote(spark: SparkSession, root: String, m: Manifest, expectedVersion: Int): Int = {
    val f = fs(spark, root)
    f.mkdirs(new Path(root, ManifestDir))
    val latest = currentVersion(spark, root)
    if (latest != expectedVersion)
      throw new ManifestConflictException(
        s"promote of $root expected v$expectedVersion but the table is at v$latest; " +
          "re-read state and retry")
    val next = expectedVersion + 1
    val body = (m.entries.toSeq.sortBy(_._1).map { case (b, g) => s"$b\t$g" }
      :+ s"# promote v$next by ${java.util.UUID.randomUUID()}")
      .mkString("", "\n", "\n").getBytes("UTF-8")
    val snapPath = new Path(root, f"$ManifestDir/m-$next%08d")
    if (!atomicCreateIfAbsent(spark, f, snapPath, body))
      throw new ManifestConflictException(
        s"promote of $root lost the race for v$next; re-read state and retry")
    // belt-and-braces for non-local schemes whose no-overwrite rename is
    // weaker than documented: confirm OUR bytes are what v<next> holds
    val readBack = {
      val in = f.open(snapPath)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.getBytes("UTF-8")
      finally in.close()
    }
    if (!java.util.Arrays.equals(readBack, body))
      throw new ManifestConflictException(
        s"promote of $root lost the race for v$next (another writer's snapshot survived); " +
          "re-read state and retry")
    refreshCurrent(spark, root)
    next
  }

  /** The shared atomic create-if-absent primitive (both CAS points — the
    * manifest snapshot and the generation-name claim — commit through
    * it): write the body to a temp sibling, then transfer it to `target`
    * failing if `target` exists. Local FS: hard link — link(2) fails with
    * EEXIST atomically, where Hadoop's LocalFs no-overwrite rename is
    * check-then-act and its .crc sidecar renames separately. HDFS:
    * rename-without-overwrite (atomic under the namenode lock). Object
    * stores swap in a conditional PUT on the key. Returns whether THIS
    * caller created the target; the temp file never survives. */
  private def atomicCreateIfAbsent(
      spark: SparkSession, f: FileSystem, target: Path, body: Array[Byte]): Boolean = {
    val tmp = new Path(target.getParent, s".tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(body) finally out.close()
    try {
      if (f.getUri.getScheme == "file") {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(target.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath)): Unit
        f.delete(tmp, false): Unit
      } else {
        FileContext.getFileContext(f.getUri, spark.sparkContext.hadoopConfiguration)
          .rename(tmp, target, Options.Rename.NONE)
      }
      true
    } catch {
      case e: java.io.IOException =>
        f.delete(tmp, false)
        // lost the race only if someone's target actually exists;
        // anything else (permissions, disk) is a real error, not a CAS loss
        if (f.exists(target)) false else throw e
    }
  }

  /** Refresh the `_CURRENT` cache from the newest snapshot (write-temp +
    * rename-OVERWRITE — atomic small-object PUT). Best-effort and
    * idempotent: out-of-order refreshes from slower committers converge
    * because each refresh re-reads the newest snapshot at copy time, and
    * readers treat the log, not the cache, as authoritative. */
  private def refreshCurrent(spark: SparkSession, root: String): Unit = {
    val f = fs(spark, root)
    manifestVersions(spark, root).lastOption.foreach { v =>
      val in = f.open(new Path(root, f"$ManifestDir/m-$v%08d"))
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.getBytes("UTF-8")
      finally in.close()
      val tmp = new Path(root, s"$ManifestFile.tmp-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, true)
      try out.write(body) finally out.close()
      FileContext.getFileContext(f.getUri, spark.sparkContext.hadoopConfiguration)
        .rename(tmp, new Path(root, ManifestFile), Options.Rename.OVERWRITE)
    }
  }

  /** Single-writer publish: promote from whatever the current version is.
    * Read-modify-write callers that must detect racing writers should read
    * [[currentVersion]] themselves and call [[promote]] with it. */
  def writeManifest(spark: SparkSession, root: String, m: Manifest): Unit = {
    promote(spark, root, m, currentVersion(spark, root)): Unit
  }

  /** Optimistic-concurrency retry loop around a read-modify-write promote:
    * `body` receives the table state it must base its new manifest on
    * (never cached across attempts — each retry re-reads) and is re-run
    * from fresh state when its final [[promote]] (or any promote inside
    * it, e.g. via [[deleteAndPromote]]) loses the CAS. This is the loser's
    * documented recovery path made into an operator, mirroring how the
    * reference's callers re-issue a batch after a Cassandra write-conflict
    * (per-partition LWT/batch atomicity, CassandraEventStore.cs:67-70).
    * Backoff-free by design: the conflict window is one small-file commit,
    * and the caller count is writers-per-table, not queries. */
  def withConflictRetry[T](maxAttempts: Int = 5)(body: => T): T = {
    var attempt = 1
    while (true) {
      try return body
      catch {
        case e: ManifestConflictException =>
          if (attempt >= maxAttempts) throw e
          attempt += 1
      }
    }
    sys.error("unreachable")
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
    * happened (or its snapshot was pruned by `vacuum`). */
  def readManifestAt(spark: SparkSession, root: String, version: Int): Option[Manifest] =
    readManifestFile(fs(spark, root), new Path(root, f"$ManifestDir/m-$version%08d"))

  /** A generation directory name this layout wrote: `g-` + digits. Foreign
    * `g-*` entries a user drops under the root (e.g. `g-backup`) must be
    * ignored everywhere — parsed here, and never vacuumed. */
  private val GenName = "g-(\\d+)".r

  private def genNumber(name: String): Option[Int] =
    name match { case GenName(d) => d.toIntOption; case _ => None }

  /** A claim marker name for generation number `n`. Markers make the
    * generation-name grab a CAS instead of a check-then-act: two writers
    * that both computed the same next number would otherwise race
    * `SaveMode.ErrorIfExists`' existence check and collide MID-WRITE
    * inside one directory (TASK_WRITE_FAILED, not a clean conflict). */
  private def claimPath(root: String, n: Int): Path =
    new Path(root, f".g-$n%08d.claim")

  private val ClaimName = "\\.g-(\\d+)\\.claim".r

  private def claimedNumber(name: String): Option[Int] =
    name match { case ClaimName(d) => d.toIntOption; case _ => None }

  /** Next unused generation number, counting both existing directories
    * and outstanding claims (a crashed writer's orphan claim just skips
    * a number — harmless). */
  def nextGeneration(spark: SparkSession, root: String): String = {
    val f = fs(spark, root)
    val p = new Path(root)
    val existing =
      if (!f.exists(p)) Array.empty[Int]
      else f.listStatus(p).map(_.getPath.getName)
        .flatMap(n => genNumber(n).orElse(claimedNumber(n)))
    f"g-${(if (existing.isEmpty) 0 else existing.max) + 1}%08d"
  }

  /** Atomically claim a fresh generation directory name: create-if-absent
    * on the claim marker, advancing past numbers other writers grab
    * concurrently. After this returns, the name is exclusively owned and
    * the data write cannot collide with a racing writer's. */
  def claimGeneration(spark: SparkSession, root: String): String = {
    val f = fs(spark, root)
    f.mkdirs(new Path(root)): Unit
    var name = nextGeneration(spark, root)
    var n = name.stripPrefix("g-").toInt
    while (!atomicCreateIfAbsent(spark, f, claimPath(root, n),
        s"claimed ${java.util.UUID.randomUUID()}\n".getBytes("UTF-8"))) {
      n += 1
      name = f"g-$n%08d"
    }
    name
  }

  /** Bootstrap: land `rows` (canonical event columns) as generation 1 and
    * promote every written bucket. */
  def bootstrap(
      spark: SparkSession, root: String, rows: DataFrame,
      nBuckets: Int = Storage.DefaultBuckets): Unit = {
    val gen = claimGeneration(spark, root)
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
      sys.error(s"Generations.readCurrent: no manifest under $root"))
    require(m.entries.nonEmpty, s"Generations.readCurrent: $root is empty (all buckets deleted)")
    resolve(spark, root, m)
  }

  /** Time travel: the table exactly as of promote `version`. Valid while
    * `vacuum(keepVersions = n)` retains that version; a pruned version
    * fails HERE, at manifest resolution, with a clear error — never with a
    * missing-path crash mid-scan — because vacuum prunes a snapshot and
    * the generations only it references together. */
  def readAt(spark: SparkSession, root: String, version: Int): DataFrame = {
    val m = readManifestAt(spark, root, version).getOrElse(
      sys.error(s"Generations.readAt: no promote v$version under $root " +
        "(never promoted, or outside the vacuum retention window)"))
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
    // capture the base version BEFORE reading state: any writer that
    // commits after this line makes the final promote() a conflict, so the
    // read-modify-write can never silently overwrite a concurrent commit
    val baseVersion = currentVersion(spark, root)
    val m = readManifest(spark, root).getOrElse(
      sys.error(s"Generations.deleteAndPromote: no manifest under $root"))
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
    val gen = claimGeneration(spark, root)
    writeGeneration(survivors, root, gen)
    val survivorBuckets = survivors.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSet
    val entries = (m.entries -- affected) ++ survivorBuckets.map(_ -> gen)
    promote(spark, root, Manifest(entries), baseVersion): Unit
    Some(gen)
  }

  /** Compaction, object-store flavor (cf. `Storage.compact`): rewrite the
    * whole current state as one generation of few large sorted files per
    * bucket, then promote. Old generations remain for in-flight readers
    * until `vacuum`. */
  def compactAndPromote(spark: SparkSession, root: String): String = {
    val baseVersion = currentVersion(spark, root)
    val gen = claimGeneration(spark, root)
    writeGeneration(readCurrent(spark, root), root, gen)
    val buckets = spark.read.parquet(s"$root/$gen")
      .select(col("bucket")).distinct().collect().map(_.getInt(0))
    promote(spark, root, Manifest(buckets.map(_ -> gen).toMap), baseVersion): Unit
    gen
  }

  /** Write a generation directory (bucket-partitioned, sorted within
    * buckets, error-if-exists). Racing writers can pick the same
    * [[nextGeneration]] name; the loser's path collision surfaces as a
    * retryable [[ManifestConflictException]], same as losing the manifest
    * CAS — [[withConflictRetry]] handles both uniformly. */
  private def writeGeneration(rows: DataFrame, root: String, gen: String): Unit =
    try {
      rows
        .repartition(col("bucket"))
        .sortWithinPartitions(col("id"), col("rev"), col("pos"))
        .write.mode(SaveMode.ErrorIfExists).partitionBy("bucket").parquet(s"$root/$gen")
    } catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage != null && e.getMessage.contains("already exists") =>
        throw new ManifestConflictException(
          s"generation $gen under $root was claimed by a racing writer; retry", e)
    }

  /** Retention-aware vacuum: keep the newest `keepVersions` promote
    * snapshots and every generation any of them references; prune older
    * snapshots TOGETHER with the generations only they reference, so time
    * travel inside the window always reads and outside it fails fast at
    * `readAt`'s manifest resolution (no snapshot left pointing at deleted
    * paths). Snapshots are pruned before generations: a crash mid-vacuum
    * leaves unreferenced-but-present generations (re-vacuumable), never a
    * readable snapshot with missing data. Run once in-flight readers of
    * evicted versions have drained — the window length is the caller's
    * retention policy, like any MVCC vacuum. Returns dropped generations. */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int = 1): Seq[String] = {
    require(keepVersions >= 1, s"vacuum must retain the current version (got $keepVersions)")
    val f = fs(spark, root)
    val versions = manifestVersions(spark, root)
    val retained = versions.takeRight(keepVersions)
    val live: Set[String] =
      if (retained.isEmpty) readManifest(spark, root).map(_.generations).getOrElse(Set.empty)
      else retained.flatMap(v => readManifestAt(spark, root, v)
        .map(_.generations).getOrElse(Set.empty[String])).toSet
    versions.dropRight(keepVersions).foreach { v =>
      f.delete(new Path(root, f"$ManifestDir/m-$v%08d"), false): Unit
    }
    val dead = f.listStatus(new Path(root)).map(_.getPath.getName)
      .filter(n => genNumber(n).isDefined && !live.contains(n)).toSeq.sorted
    dead.foreach { n =>
      f.delete(new Path(root, n), true): Unit
      // the name's claim marker goes with its directory; orphan claims of
      // crashed writers (marker, no directory) are left alone — numbering
      // skips them, and an in-flight writer may still own one
      genNumber(n).foreach(num => f.delete(claimPath(root, num), false): Unit)
    }
    dead
  }
}
