package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import graft.sources.{CommitPrimitive, Generations, ManifestConflictException, Storage}

/** The injectable commit primitive (round-9 verdict #1): the manifest CAS
  * commits through CommitPrimitive, object stores inject a conditional PUT,
  * and — the part the sandbox CAN prove without S3 — a deployment stuck on
  * a NON-atomic fallback (connector "rename" = copy + last-writer-wins)
  * degrades to detection, not silent loss: the writer whose bytes were
  * overwritten gets a retryable ManifestConflictException from promote()'s
  * read-back. */
class CommitPrimitiveSpec extends SparkSpec {

  private def mkLog(ids: Seq[String]) = {
    import spark.implicits._
    ids.flatMap(id => (1 to 2).map(r => (id, r))).toDF("ids", "rev")
      .select(col("ids").cast("binary").as("id"), col("rev"),
        lit(0).as("pos"), lit(1L).as("ts"), lit("d".getBytes).as("data"))
  }

  private def readBytes(f: FileSystem, p: Path): Array[Byte] = {
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.getBytes("UTF-8")
    finally in.close()
  }

  test("scheme dispatch: local filesystems commit via hard link") {
    val f = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(CommitPrimitive.forFileSystem(f) eq CommitPrimitive.LocalHardLink)
  }

  test("scheme dispatch: object-store schemes demand an injected conditional PUT") {
    for (s <- Seq("s3a", "gs", "abfss")) {
      val e = intercept[RuntimeException](CommitPrimitive.forScheme(s))
      assert(e.getMessage.contains("conditional-PUT") && e.getMessage.contains(s))
    }
    assert(CommitPrimitive.forScheme("hdfs") eq CommitPrimitive.RenameNoOverwrite)
  }

  test("object-store conditional PUT: two racing writers, exactly one winner") {
    import graft.sources.{MemoryObjectStore, ManifestConflictException}
    val root = tmpDir() + "/events"
    Generations.bootstrap(spark, root, mkLog(Seq("a", "b")), nBuckets = 4) // v1
    val base = Generations.currentVersion(spark, root)
    val m = Generations.readManifest(spark, root).get
    // two writers race DIFFERENT intended manifests from the same base
    // through the S3-semantics double; the conditional PUT is the only
    // atomic point, and it must pick exactly one
    val mA = Generations.Manifest(m.entries.map { case (b, _) => b -> "g-0000000a" })
    val mB = Generations.Manifest(m.entries.map { case (b, _) => b -> "g-0000000b" })
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (g <- Seq("g-0000000a", "g-0000000b")) f.mkdirs(new Path(root, g))
    val store = new MemoryObjectStore
    val gate = new java.util.concurrent.CountDownLatch(2)
    val results = new java.util.concurrent.ConcurrentHashMap[String, Either[Throwable, Int]]()
    val threads = Seq("a" -> mA, "b" -> mB).map { case (tag, mi) =>
      new Thread(() => {
        // withCommitPrimitive is thread-local: each racer wires the double
        // on its own thread
        Generations.withCommitPrimitive(
          new CommitPrimitive.ObjectStoreConditionalPut(store)) {
          gate.countDown(); gate.await()
          results.put(tag,
            try Right(Generations.promote(spark, root, mi, base))
            catch { case t: Throwable => Left(t) })
        }: Unit
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val (wins, losses) = Seq("a", "b").map(results.get).partition(_.isRight)
    assert(wins.size == 1 && losses.size == 1)
    assert(losses.head.left.exists(_.isInstanceOf[ManifestConflictException]))
    // the store arbitrated: the surviving snapshot is the winner's, both in
    // the store's view and the filesystem mirror
    val winnerGen = if (results.get("a").isRight) "g-0000000a" else "g-0000000b"
    val snap = new Path(root, "_manifests/m-00000002")
    assert(readBytes(f, snap).sameElements(store.get(snap.toString).get))
    assert(Generations.readManifestAt(spark, root, 2).get.entries.values.toSet == Set(winnerGen))
    // no stray tmp files survive the race
    assert(!f.listStatus(new Path(root, "_manifests"))
      .exists(_.getPath.getName.startsWith(".tmp-")))
  }

  test("a non-atomic last-writer-wins publish is detected by the read-back") {
    val root = tmpDir() + "/events"
    Generations.bootstrap(spark, root, mkLog(Seq("a", "b")), nBuckets = 4) // v1
    val m = Generations.readManifest(spark, root).get
    val base = Generations.currentVersion(spark, root)

    // models an object store whose rename/PUT has no precondition: OUR put
    // lands, then the racing writer's put overwrites the same key last —
    // both callers observe success, one commit is silently gone at rest
    val foreignBody = "0\tg-00000099\n# promote by the racing writer\n".getBytes("UTF-8")
    val lastWriterWins = new CommitPrimitive {
      def publish(f: FileSystem, conf: Configuration, tmp: Path, target: Path): Boolean = {
        val mine = readBytes(f, tmp)
        val out1 = f.create(target, true); out1.write(mine); out1.close()
        val out2 = f.create(target, true); out2.write(foreignBody); out2.close()
        f.delete(tmp, false): Unit
        true
      }
    }
    val e = intercept[ManifestConflictException] {
      Generations.withCommitPrimitive(lastWriterWins) {
        Generations.promote(spark, root, m, base)
      }
    }
    assert(e.getMessage.contains("another writer's snapshot survived"))

    // the surviving snapshot is the racer's, byte-intact — detection did
    // not corrupt the winner's commit
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(readBytes(f, new Path(root, "_manifests/m-00000002")).sameElements(foreignBody))
    assert(Generations.readManifestAt(spark, root, 2).get.entries(0) == "g-00000099")

    // and the loser's documented recovery path — re-read state, retry on
    // an atomic primitive — commits cleanly as the next version
    val v = Generations.promote(spark, root, m, Generations.currentVersion(spark, root))
    assert(v == 3)
    assert(Generations.readManifestAt(spark, root, 3).get == m)
  }

  test("promote retracts its snapshot when the generation vanishes inside the CAS window") {
    val root = tmpDir() + "/events"
    Generations.bootstrap(spark, root, mkLog(Seq("a", "b")), nBuckets = 4) // v1
    val base = Generations.currentVersion(spark, root)
    val gen2 = Generations.claimGeneration(spark, root)
    Storage.appendEvents(mkLog(Seq("x")), s"$root/$gen2", nBuckets = 4)
    val buckets = spark.read.parquet(s"$root/$gen2")
      .select(col("bucket")).distinct().collect().map(_.getInt(0))
    val intended = Generations.Manifest(
      Generations.readManifest(spark, root).get.entries ++ buckets.map(_ -> gen2))
    // models a vacuum(orphanGraceMs) landing INSIDE the guard->CAS window:
    // the pre-CAS existence guard passed, the snapshot publish succeeds,
    // and the referenced generation is reclaimed concurrently
    val vacuumDuringCas = new CommitPrimitive {
      def publish(f: FileSystem, conf: Configuration, tmp: Path, target: Path): Boolean = {
        val created = CommitPrimitive.LocalHardLink.publish(f, conf, tmp, target)
        f.delete(new Path(root, gen2), true): Unit
        created
      }
    }
    val e = intercept[RuntimeException] {
      Generations.withCommitPrimitive(vacuumDuringCas) {
        Generations.promote(spark, root, intended, base)
      }
    }
    assert(e.getMessage.contains("retracted"))
    // the compensating delete returned the log to the pre-commit tip:
    // no manifest version references the reclaimed generation
    assert(Generations.currentVersion(spark, root) == base)
    assert(!Generations.readManifest(spark, root).get.generations.contains(gen2))
    assert(Generations.readCurrent(spark, root).count() == 4)
  }

  test("an injected conditional PUT (faithful create-if-absent) wins exactly once") {
    val root = tmpDir() + "/events"
    Generations.bootstrap(spark, root, mkLog(Seq("a", "b")), nBuckets = 4)
    val m = Generations.readManifest(spark, root).get
    val base = Generations.currentVersion(spark, root)
    // a conditional PUT: if-none-match on the key, no rename involved —
    // what an S3/GCS/ABFS integration would inject
    var puts = 0
    val conditionalPut = new CommitPrimitive {
      def publish(f: FileSystem, conf: Configuration, tmp: Path, target: Path): Boolean =
        this.synchronized {
          puts += 1
          if (f.exists(target)) { f.delete(tmp, false): Unit; false }
          else {
            val b = readBytes(f, tmp)
            val out = f.create(target, false); out.write(b); out.close()
            f.delete(tmp, false): Unit
            true
          }
        }
    }
    Generations.withCommitPrimitive(conditionalPut) {
      assert(Generations.promote(spark, root, m, base) == base + 1)
      // a second writer holding the same base loses BEFORE the put (version
      // precheck) — and a forced same-version put returns created=false
      intercept[ManifestConflictException](Generations.promote(spark, root, m, base))
    }
    assert(puts >= 1)
    assert(Generations.currentVersion(spark, root) == base + 1)
  }
}
