package graft

import org.apache.spark.sql.functions._
import graft.sources.Storage

/** Round-9 verdict #5: the session-catalog face of the tenant/keyspace
  * layout — `SELECT ... FROM tenant_ks.events` must read exactly what the
  * path API reads, registration must be idempotent (the reference's
  * re-runnable DDL bootstrap), and re-registering after appends must
  * surface the new partitions. */
class CatalogSpec extends SparkSpec {

  private def mkEvents(ids: Seq[Long]) = {
    import spark.implicits._
    ids.flatMap(id => (1 to 2).map(r => (id, r))).toDF("ids", "rev")
      .select(col("ids").cast("string").cast("binary").as("id"), col("rev"),
        lit(0).as("pos"), (col("rev") * 1000L).as("ts"), lit("d".getBytes).as("data"))
  }

  test("registerVersioned: catalog view == readCurrent; re-register picks up a promote") {
    import graft.sources.Generations
    implicit val s = spark
    val root = tmpDir()
    val (tenant, ks) = ("verstest", "ks")
    val vroot = Storage.tablePath(root, tenant, ks, "events_versioned")
    Generations.bootstrap(spark, vroot, mkEvents(1L to 4L), nBuckets = 4)

    val db = Storage.registerVersioned(root, tenant, ks)
    try {
      // the catalog view resolves exactly the manifest's files
      val viaSql = spark.sql(s"SELECT id, rev, pos, ts, bucket FROM `$db`.events_versioned")
      val viaApi = Generations.readCurrent(spark, vroot)
        .select("id", "rev", "pos", "ts", "bucket")
      assert(viaSql.count() == 8)
      assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
      // a bucket literal folds every other branch away: only that bucket's
      // generation directory is scanned
      val b = Storage.bucketOf("1".getBytes, 4)
      val pruned = spark.sql(s"SELECT * FROM `$db`.events_versioned WHERE bucket = $b")
      val files = pruned.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f.relation.location.inputFiles
      }.flatten
      assert(files.nonEmpty && files.forall(_.contains(s"bucket=$b")))

      // promote a delete, re-register: the view repoints to the new manifest
      val tomb = Generations.readCurrent(spark, vroot)
        .filter(col("id") === lit("1".getBytes)).select("id", "rev", "pos")
      Generations.deleteAndPromote(spark, vroot, tomb, nBuckets = 4)
      Storage.registerVersioned(root, tenant, ks)
      val after = spark.sql(s"SELECT id, rev, pos, ts, bucket FROM `$db`.events_versioned")
      val afterApi = Generations.readCurrent(spark, vroot)
        .select("id", "rev", "pos", "ts", "bucket")
      assert(after.count() == 6)
      assert(after.exceptAll(afterApi).isEmpty && afterApi.exceptAll(after).isEmpty)
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE"): Unit
    }
  }

  test("registerCatalog: SQL over the catalog equals the path read; idempotent; sees appends") {
    implicit val s = spark
    val root = tmpDir()
    val (tenant, ks) = ("cattest", "ks")
    Storage.createStorage(root, tenant, ks)
    val eventsPath = Storage.tablePath(root, tenant, ks, "events")
    Storage.appendEvents(mkEvents(1L to 4L), eventsPath, nBuckets = 4)

    val db = Storage.registerCatalog(root, tenant, ks)
    try {
      assert(db == "cattest_ks")
      // the catalog read IS the path read
      val viaSql = spark.sql(s"SELECT id, rev, pos, ts, bucket FROM `$db`.events")
      val viaPath = spark.read.parquet(eventsPath).select("id", "rev", "pos", "ts", "bucket")
      assert(viaSql.count() == 8)
      assert(viaSql.exceptAll(viaPath).isEmpty && viaPath.exceptAll(viaSql).isEmpty)
      // partition pruning survives the catalog: a bucket filter prunes dirs
      val b = Storage.bucketOf("1".getBytes, 4)
      val pruned = spark.sql(s"SELECT * FROM `$db`.events WHERE bucket = $b")
      val scanned = pruned.queryExecution.executedPlan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f.relation.location.inputFiles
      }.getOrElse(Array.empty[String])
      assert(scanned.nonEmpty && scanned.forall(_.contains(s"bucket=$b")))
      // empty sibling tables were skipped (no schema to infer yet)
      assert(!spark.catalog.tableExists(s"`$db`.messages"))

      // idempotent re-registration, and appends become visible through it
      Storage.appendEvents(mkEvents(5L to 6L), eventsPath, nBuckets = 4)
      assert(Storage.registerCatalog(root, tenant, ks) == db)
      assert(spark.sql(s"SELECT count(*) AS n FROM `$db`.events").head().getLong(0) == 12)

      // analyze=true feeds the CBO: catalog stats carry the exact row count
      Storage.registerCatalog(root, tenant, ks, analyze = true)
      val stats = spark.sql(s"DESCRIBE TABLE EXTENDED `$db`.events")
        .filter(col("col_name") === "Statistics").select("data_type")
        .collect().map(_.getString(0))
      assert(stats.nonEmpty && stats.head.contains("12 rows"), s"stats: ${stats.toSeq}")

      // predicate pushdown survives the catalog path: a ts bound reaches
      // the parquet scan as a pushed filter (row-group min/max skipping),
      // same as the path read
      val tsPlan = spark.sql(s"SELECT * FROM `$db`.events WHERE ts >= 1500")
        .queryExecution.executedPlan.toString
      assert(tsPlan.contains("PushedFilters") &&
        tsPlan.matches("(?s).*PushedFilters[^\\]]*ts[^\\]]*\\].*"), tsPlan)

      // the (et, pid)-partitioned index table: MSCK partition recovery and
      // partition pruning through the catalog
      import spark.implicits._
      val idxPath = Storage.tablePath(root, tenant, ks, "index_by_eventtype")
      Storage.appendIndex(Seq(
        ("order", 2024001, "1".getBytes, 1, 0, 1000L),
        ("order", 2024002, "2".getBytes, 1, 0, 2000L),
        ("user", 2024001, "3".getBytes, 1, 0, 3000L)
      ).toDF("et", "pid", "id", "rev", "pos", "ts"), idxPath)
      Storage.registerCatalog(root, tenant, ks)
      val viaCat = spark.sql(s"SELECT et, pid, id FROM `$db`.index_by_eventtype")
      assert(viaCat.count() == 3)
      val prunedIdx = spark.sql(
        s"SELECT * FROM `$db`.index_by_eventtype WHERE et = 'order' AND pid = 2024001")
      val idxFiles = prunedIdx.queryExecution.executedPlan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f.relation.location.inputFiles
      }.getOrElse(Array.empty[String])
      assert(idxFiles.nonEmpty && idxFiles.forall(f =>
        f.contains("et=order") && f.contains("pid=2024001")), idxFiles.toSeq.toString)
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE"): Unit
    }
  }
}
