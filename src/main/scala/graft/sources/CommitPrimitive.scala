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

  /** Scheme dispatch: local -> hard link; everything else -> no-overwrite
    * rename (atomic on HDFS; object-store deployments inject their
    * conditional-PUT primitive instead). */
  def forFileSystem(f: FileSystem): CommitPrimitive =
    if (f.getUri.getScheme == "file") LocalHardLink else RenameNoOverwrite
}
