package graft.table

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SnapshotSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshRoot(): String =
    Files.createTempDirectory("snapstore").toString

  private def input = {
    spark.range(1000).select(
      col("id"),
      pmod(col("id"), lit(8)).cast("int").as("bucket"),
      (col("id") * 3).as("value"))
  }

  test("snapshot store: commit, read back, lineage + metrics") {
    val store = new SnapshotStore(freshRoot())
    assert(store.current().isEmpty)
    val s1 = store.commit(Seq(PartitionMeta(0, 10, 100, "in@v1", Seq("a.parquet"))))
    assert(s1.version === 1 && s1.doneBuckets === Set(0))
    val s2 = store.commit(Seq(PartitionMeta(1, 20, 200, "in@v1", Seq("b.parquet"))))
    assert(s2.version === 2 && s2.doneBuckets === Set(0, 1))
    val re = store.readSnapshot(2)
    assert(re.partitions(1).rows === 20)
    assert(re.partitions(0).lineage === "in@v1")
    assert(store.pending(0 until 4) === Seq(2, 3))
  }

  test("table properties: band descriptions + crs round-trip, version, survive commits") {
    val store = new SnapshotStore(freshRoot())
    store.commit(Seq(PartitionMeta(0, 10, 100, "in@v1", Seq("a.parquet"))))
    // set_band_descriptions analog — escaping exercised (quotes/backslash)
    store.setBandDescriptions(Seq("red", "nir \"raw\"", "b\\slash"))
    assert(store.bandDescriptions === Seq("red", "nir \"raw\"", "b\\slash"))
    store.setCrsProperty(32632)
    // re-open the store fresh: properties must come from the manifest
    val reopened = new SnapshotStore(store.root)
    assert(reopened.bandDescriptions === Seq("red", "nir \"raw\"", "b\\slash"))
    assert(reopened.crsProperty === Some(32632))
    // a later data commit carries properties forward
    store.commit(Seq(PartitionMeta(1, 20, 200, "in@v1", Seq("b.parquet"))))
    assert(store.current().get.properties("crs") === "32632")
    assert(store.current().get.doneBuckets === Set(0, 1))
    // historical snapshot keeps its own property state (version 1: none)
    assert(store.readSnapshot(1).properties.isEmpty)
  }

  test("tile-level set_crs stamps crs without touching pixels or georeference") {
    import graft.tiles.{RasterSpec, TileOps, TileOps2}
    val spec = RasterSpec(0.0, 8.0, 1.0, -1.0, 8, 8, 8, 1, crs = 4326)
    val tiles = TileOps.createRaster(spark, spec)((x, y, _) => (x + y).toDouble)
    val out = TileOps2.setCrs(tiles, 3857).collect()
    assert(out.forall(_.crs == 3857))
    assert(out.head.pixels.toSeq == tiles.collect().head.pixels.toSeq)
    assert(out.head.originX == 0.0 && out.head.originY == 8.0)
  }

  test("checkpointed writer: full run commits all buckets with row metrics") {
    val store = new SnapshotStore(freshRoot())
    val (snap, computed) = new CheckpointedWriter(store, "src@test").run(
      input, numBuckets = 8, bucketsPerCommit = 3)
    assert(computed === 8)
    assert(snap.doneBuckets === (0 until 8).toSet)
    assert(snap.partitions.values.map(_.rows).sum === 1000)
    assert(snap.partitions.values.forall(_.bytes > 0))
    val readBack = spark.read.parquet(s"${store.root}/data")
    assert(readBack.count() === 1000)
  }

  test("kill mid-run resumes from snapshot, recomputing only missing buckets") {
    val store = new SnapshotStore(freshRoot())
    val w = new CheckpointedWriter(store, "src@test")
    // killed after 1 commit (3 of 8 buckets done)
    val (_, c1) = w.run(input, 8, 3, failAfterCommits = 1)
    assert(c1 === 3)
    assert(store.current().get.doneBuckets.size === 3)
    // resume: only the 5 missing buckets are computed
    val (snap, c2) = w.run(input, 8, 3)
    assert(c2 === 5)
    assert(snap.doneBuckets === (0 until 8).toSet)
    // resumed table equals a one-shot run
    val oneShotStore = new SnapshotStore(freshRoot())
    new CheckpointedWriter(oneShotStore, "src@test").run(input, 8, 3)
    val a = spark.read.parquet(s"${store.root}/data")
      .select("id", "value").orderBy("id").collect().toSeq
    val b = spark.read.parquet(s"${oneShotStore.root}/data")
      .select("id", "value").orderBy("id").collect().toSeq
    assert(a === b)
    // version history: 1 commit from run A + 2 from resume
    assert(store.current().get.version === 3)
  }

  test("direct committer: same table, resumable, manifest-pinned files") {
    val store = new SnapshotStore(freshRoot())
    val w = new CheckpointedWriter(store, "src@test")
    val (_, c1) = w.run(input, 8, 3, failAfterCommits = 1, mode = "direct")
    assert(c1 === 3)
    val (snap, c2) = w.run(input, 8, 3, mode = "direct")
    assert(c2 === 5)
    assert(snap.doneBuckets === (0 until 8).toSet)
    assert(snap.partitions.values.map(_.rows).sum === 1000)
    // files are data-relative (group dirs), and readVersion resolves them
    assert(snap.partitions.values.forall(_.files.forall(_.contains("/"))))
    val readBack = store.readVersion(spark, snap.version)
    assert(readBack.count() === 1000)
    // equal to the dynamic-mode table
    val dynStore = new SnapshotStore(freshRoot())
    new CheckpointedWriter(dynStore, "src@test").run(input, 8, 3)
    val a = readBack.select("id", "value").orderBy("id").collect().toSeq
    val b = spark.read.parquet(s"${dynStore.root}/data")
      .select("id", "value").orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("time travel: readVersion pins each snapshot's exact file set") {
    val store = new SnapshotStore(freshRoot())
    val w = new CheckpointedWriter(store, "src@test")
    w.run(input, 8, 3, failAfterCommits = 1) // v1: buckets 0..2
    val v1 = store.current().get.version
    w.run(input, 8, 3) // v2, v3: the rest
    val v3 = store.current().get.version
    val n1 = store.readVersion(spark, v1).count()
    val n3 = store.readVersion(spark, v3).count()
    assert(n1 === input.filter(col("bucket") < 3).count())
    assert(n3 === 1000L)
    // historical snapshot rows equal the data of exactly its buckets
    val ids1 = store.readVersion(spark, v1).select("id").collect().map(_.getLong(0)).toSet
    val expect1 = input.filter(col("bucket") < 3).select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 === expect1)
  }

  test("compaction: multi-file buckets rewrite to one file, time travel intact") {
    val root = freshRoot()
    val store = new SnapshotStore(root)
    // bucket 0 with TWO files (two physical writes), bucket 1 with one
    val d0 = java.nio.file.Paths.get(store.dataPath(0))
    java.nio.file.Files.createDirectories(d0)
    def writeFile(bucket: Int, tag: String, lo: Int, hi: Int): String = {
      val dest = s"${store.dataPath(bucket)}/$tag"
      spark.range(lo, hi).toDF("id").coalesce(1).write.mode("overwrite").parquet(dest)
      val f = java.nio.file.Files.list(java.nio.file.Paths.get(dest)).iterator()
      var name = ""
      while (f.hasNext) { val p = f.next()
        if (p.getFileName.toString.endsWith(".parquet")) name = p.getFileName.toString }
      s"$tag/$name"
    }
    val f1 = writeFile(0, "g1", 0, 50)
    val f2 = writeFile(0, "g2", 50, 80)
    val f3 = writeFile(1, "g3", 100, 130)
    store.commit(Seq(
      PartitionMeta(0, 80, 1, "src@t", Seq(s"bucket=0/$f1", s"bucket=0/$f2")),
      PartitionMeta(1, 30, 1, "src@t", Seq(s"bucket=1/$f3"))))
    val v1 = store.current().get.version
    val (snap2, compacted) = store.compactBuckets(spark)
    assert(compacted === Seq(0)) // only the 2-file bucket
    val s2 = snap2.get
    assert(s2.partitions(0).files.length === 1)
    assert(s2.partitions(0).files.head.startsWith("compact-v"))
    assert(s2.partitions(0).lineage === "src@t+compact")
    assert(s2.partitions(1).files === Seq(s"bucket=1/$f3")) // untouched
    // current reads the compacted file set with identical content
    val cur = store.readVersion(spark, s2.version).agg(sum("id")).head.getLong(0)
    assert(cur === (0 until 80).sum + (100 until 130).sum)
    // time travel to pre-compaction still reads the old 2-file layout
    val old = store.readVersion(spark, v1).count()
    assert(old === 110)
    // idempotent: everything is single-file now
    val (_, again) = store.compactBuckets(spark)
    assert(again.isEmpty)
    // expire reclaims the replaced pre-compaction files
    val (_, deleted) = store.expireSnapshots(keepLast = 1)
    assert(deleted.nonEmpty)
    assert(store.readVersion(spark, s2.version).count() === 110)
  }

  test("merge: upsert rewrites only touched buckets, time travel intact") {
    val store = new SnapshotStore(freshRoot())
    val (snap1, _) = new CheckpointedWriter(store, "src@test").run(input, 8, 8)
    // updates touch bucket 1 only: replace id=9's value, insert id=1001
    val updates = spark.createDataFrame(Seq(
        (9L, 1, 999L), (1001L, 1, 777L)))
      .toDF("id", "bucket", "value")
    val (snap2, rewritten) = store.mergeBuckets(spark, updates, "id")
    assert(rewritten === Seq(1))
    assert(snap2.partitions(1).files.head.startsWith("merge-v"))
    assert(snap2.partitions(1).lineage === "src@test+merge")
    assert(snap2.partitions(1).rows === 126) // 125 + 1 insert
    // untouched buckets keep their exact file lists
    (0 until 8).filter(_ != 1).foreach { b =>
      assert(snap2.partitions(b).files === snap1.partitions(b).files, s"b$b")
    }
    // merged read: update applied, insert present, rest unchanged
    val cur = store.readVersion(spark, snap2.version)
    assert(cur.filter(col("id") === 9L).select("value").head.getLong(0) === 999L)
    assert(cur.filter(col("id") === 1001L).count() === 1)
    assert(cur.count() === 1001)
    assert(cur.filter(col("id") === 17L).select("value").head.getLong(0) === 51L)
    // time travel: pre-merge version still reads the original value
    val old = store.readVersion(spark, snap1.version)
    assert(old.filter(col("id") === 9L).select("value").head.getLong(0) === 27L)
    assert(old.count() === 1000)
    // empty update set is a no-op
    val (snap3, none) = store.mergeBuckets(spark,
      updates.filter(col("id") < 0), "id")
    assert(none.isEmpty && snap3.version === snap2.version)
    // duplicate update keys are a MERGE error, not a double-insert
    val dup = spark.createDataFrame(Seq((9L, 1, 1L), (9L, 1, 2L)))
      .toDF("id", "bucket", "value")
    val err = intercept[IllegalArgumentException] {
      store.mergeBuckets(spark, dup, "id")
    }
    assert(err.getMessage.contains("duplicate update keys"))
    // expire reclaims the replaced pre-merge bucket-1 file
    val (_, deleted) = store.expireSnapshots(keepLast = 1)
    assert(deleted.nonEmpty)
    assert(store.readVersion(spark, snap2.version).count() === 1001)
  }

  test("GeoTIFF tile table: tiles commit as tiff blobs and read back exactly") {
    import graft.tiles.{RasterSpec, TileOps}
    import spark.implicits._
    val spec = RasterSpec(0.0, 16.0, 0.5, -0.5, 32, 32, 8, 1)
    val tiles = TileOps.createRaster(spark, spec)(
      (x, y, _) => ((x * 7 + y * 13) % 97).toDouble)
    val blobs = tiles.map { t =>
      val px = new Array[Byte](t.w * t.h)
      var i = 0
      while (i < px.length) { px(i) = t.pixels(i).toInt.toByte; i += 1 }
      ((t.cellX * 31 + t.cellY) % 4, t.cellX, t.cellY,
        graft.ops.Tiff.encode(t.w, t.h, 1, px,
          t.originX, t.originY, t.pxW, t.pxH))
    }.toDF("bucket", "cell_x", "cell_y", "tiff")
    val store = new SnapshotStore(freshRoot())
    val (snap, n) = new CheckpointedWriter(store, "tiles@tiff")
      .run(blobs, numBuckets = 4, bucketsPerCommit = 2)
    assert(n === 4 && snap.partitions.values.map(_.rows).sum === 16)
    // read back through the snapshot, decode, compare pixels + geort
    val back = store.readVersion(spark, snap.version)
      .collect().map { r =>
        val d = graft.ops.Tiff.decode(r.getAs[Array[Byte]]("tiff"))
        (r.getAs[Int]("cell_x"), r.getAs[Int]("cell_y")) -> d
      }.toMap
    val want = tiles.collect()
    assert(back.size === 16 && want.length === 16)
    want.foreach { t =>
      val d = back((t.cellX, t.cellY))
      assert(d.pixels.map(b => (b & 0xff).toDouble).toSeq === t.pixels.toSeq,
        s"tile ${t.cellX},${t.cellY}")
      assert((d.originX, d.originY, d.pxW, d.pxH) ===
        ((t.originX, t.originY, t.pxW, t.pxH)))
    }
  }

  test("expire_snapshots + remove_orphan_files: retained reads intact") {
    val root = freshRoot()
    val store = new SnapshotStore(root)
    val w = new CheckpointedWriter(store, "src@test")
    w.run(input, 8, 2, failAfterCommits = 1) // v1: buckets 0..1
    w.run(input, 8, 2, failAfterCommits = 1) // v2: buckets 2..3
    w.run(input, 8, 2)                       // v3, v4: the rest
    val cur = store.current().get.version
    assert(cur >= 3)
    // plant an ORPHAN: a data file present on disk but referenced by no
    // manifest (the residue a failed task attempt leaves behind)
    val extra = java.nio.file.Paths.get(store.dataPath(0), "orphan.parquet")
    java.nio.file.Files.copy(
      java.nio.file.Files.list(java.nio.file.Paths.get(store.dataPath(0)))
        .iterator().next(), extra)
    val before = store.readVersion(spark, cur).count()
    val (expired, deleted) = store.expireSnapshots(keepLast = 2)
    // v1 (and v2 when cur=4) expired; orphan.parquet deleted
    assert(expired.nonEmpty && expired.forall(_ <= cur - 2))
    assert(deleted.exists(_.endsWith("orphan.parquet")), deleted.mkString(","))
    // retained snapshots still read exactly as before
    assert(store.readVersion(spark, cur).count() === before)
    assert(store.readVersion(spark, cur - 1).count() > 0)
    // expired manifest is gone
    intercept[Exception](store.readSnapshot(expired.head))
    // idempotent: second run deletes nothing further
    val (e2, d2) = store.expireSnapshots(keepLast = 2)
    assert(e2.isEmpty && d2.isEmpty)
  }
}
