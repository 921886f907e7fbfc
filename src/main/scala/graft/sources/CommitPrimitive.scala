package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

/** The atomic transfer step both of [[Generations]]' CAS points (the
  * versioned manifest snapshot and the generation-name claim marker) commit
  * through: publish an already-written temp file as `target`, failing if
  * `target` exists.
  *
  * This is the one storage-system-specific primitive in the MVCC layer —
  * the analogue of the per-partition atomicity the reference gets from
  * Cassandra for free (`CassandraEventStore.cs:67-70`). Contract:
  *
  *  - Returns true iff THIS call created `target`; on success `tmp` must
  *    not survive.
  *  - A loss (target already exists) surfaces as `false` or as an
  *    `IOException` with `target` present — [[Generations]] treats both as
  *    a CAS loss and cleans up `tmp`.
  *  - Implementations should be genuinely atomic (hard link, namenode-lock
  *    rename, conditional PUT). Where a deployment cannot provide one
  *    (e.g. an object store reached through a Hadoop connector whose
  *    rename is copy-then-delete, last-writer-wins), [[Generations.promote]]'s
  *    post-commit read-back narrows the race to detection: the writer whose
  *    bytes did not survive gets a retryable conflict instead of silently
  *    losing its commit — proven against the non-atomic double in
  *    CommitPrimitiveSpec.
  *
  * Deployments on stores with a native conditional create (S3
  * If-None-Match PUT, GCS if-generation-match, ABFS ETag) should inject an
  * implementation via [[Generations.withCommitPrimitive]]; the SDK call is
  * one method and everything above it (claim, promote, retry, vacuum)
  * composes unchanged.
  */
trait CommitPrimitive {
  def publish(f: FileSystem, conf: Configuration, tmp: Path, target: Path): Boolean
}

object CommitPrimitive {

  /** Local filesystems: hard link. link(2) fails with EEXIST atomically,
    * whereas Hadoop LocalFileSystem's no-overwrite rename is check-then-act
    * (and renames its .crc sidecar separately). */
  object LocalHardLink extends CommitPrimitive {
    def publish(f: FileSystem, conf: Configuration, tmp: Path, target: Path): Boolean = {
      java.nio.file.Files.createLink(
        java.nio.file.Paths.get(target.toUri.getPath),
        java.nio.file.Paths.get(tmp.toUri.getPath)): Unit
      f.delete(tmp, false): Unit
      true
    }
  }

  /** HDFS-style filesystems: rename without overwrite — atomic under the
    * namenode lock. Also the best-effort fallback for schemes with no
    * injected primitive; there the promote read-back is the safety net. */
  object RenameNoOverwrite extends CommitPrimitive {
    def publish(f: FileSystem, conf: Configuration, tmp: Path, target: Path): Boolean = {
      FileContext.getFileContext(f.getUri, conf).rename(tmp, target, Options.Rename.NONE)
      true
    }
  }

  /** Object stores with a native conditional create: the arbitration step
    * is the store's conditional PUT — the one genuinely atomic point those
    * systems offer (S3 `If-None-Match: *`, GCS `ifGenerationMatch=0`, ABFS
    * ETag create) — and the winner then materializes `target` through the
    * FileSystem so the filesystem view carries the committed bytes. In a
    * real deployment the [[ConditionalStore]] is the SDK call against the
    * same bucket the FileSystem reads, so the PUT itself creates `target`
    * and the mirror write merely overwrites it with identical bytes.
    * Proven against [[MemoryObjectStore]] (CommitPrimitiveSpec races two
    * writers; exactly one wins, the loser's bytes never land). */
  final class ObjectStoreConditionalPut(store: ConditionalStore) extends CommitPrimitive {
    def publish(f: FileSystem, conf: Configuration, tmp: Path, target: Path): Boolean = {
      val in = f.open(tmp)
      val bytes = try in.readAllBytes() finally in.close()
      val won = store.putIfAbsent(target.toString, bytes)
      if (won) {
        val out = f.create(target, true)
        try out.write(bytes) finally out.close()
      }
      f.delete(tmp, false): Unit
      won
    }
  }

  /** Scheme dispatch: local -> hard link; object-store schemes -> fail
    * loudly (their Hadoop connectors implement rename as copy + delete,
    * last-writer-wins — a silent-loss CAS; the deployment must inject a
    * conditional-PUT primitive, see [[ObjectStoreConditionalPut]]);
    * everything else -> no-overwrite rename (atomic on HDFS, and the
    * best-effort fallback backstopped by promote's read-back). */
  def forFileSystem(f: FileSystem): CommitPrimitive = forScheme(f.getUri.getScheme)

  private[sources] val ObjectStoreSchemes =
    Set("s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs", "oss", "cos")

  def forScheme(scheme: String): CommitPrimitive =
    if (scheme == "file") LocalHardLink
    else if (ObjectStoreSchemes(scheme))
      sys.error(s"scheme '$scheme' has no atomic rename: inject the store's " +
        "conditional-PUT primitive via Generations.setCommitPrimitive / " +
        "withCommitPrimitive (see CommitPrimitive.ObjectStoreConditionalPut " +
        "for the tested exemplar over an If-None-Match PUT)")
    else RenameNoOverwrite
}

/** The one call an object-store deployment supplies: create `key` holding
  * `bytes` iff the key is absent, atomically, returning whether THIS call
  * created it — S3's `If-None-Match: *` PUT, GCS's `ifGenerationMatch=0`,
  * ABFS's ETag-conditional create are each exactly this. */
trait ConditionalStore {
  def putIfAbsent(key: String, bytes: Array[Byte]): Boolean
}

/** In-memory [[ConditionalStore]] with the S3 conditional-PUT semantics
  * (linearizable create-if-absent; losers observe `false`, never partial
  * state) — the double [[CommitPrimitive.ObjectStoreConditionalPut]] is
  * raced against in CommitPrimitiveSpec. */
final class MemoryObjectStore extends ConditionalStore {
  private val objects = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  def putIfAbsent(key: String, bytes: Array[Byte]): Boolean =
    objects.putIfAbsent(key, bytes.clone()) == null
  def get(key: String): Option[Array[Byte]] = Option(objects.get(key)).map(_.clone())
}
