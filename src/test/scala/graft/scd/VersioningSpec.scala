package graft.scd

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import java.sql.Timestamp

class VersioningSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("W1: latest row per key gets current=1, all others 0") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L),
      (1L, ts("2024-01-02 00:00:00"), 11L),
      (2L, ts("2024-01-01 00:00:00"), 12L)
    ).toDF("item_id", "ts", "event_id")
    val out = Versioning.withCurrentFlag(df, "item_id", "ts", "event_id")
      .select("event_id", "current").as[(Long, Int)].collect().toMap
    assert(out === Map(10L -> 0, 11L -> 1, 12L -> 1))
  }

  test("W1 hot-key route: withCurrentFlagAgg equals the window form " +
      "on a skewed synthetic (one key holding half the history), " +
      "ties included") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 400).map { i =>
      val key = if (i % 2 == 0) 0L else 1L + rnd.nextInt(50)
      // coarse timestamps force (ts, event_id) tiebreaks to matter
      (key, ts(f"2024-01-${1 + rnd.nextInt(9)}%02d 00:00:00"),
        i.toLong)
    }
    val df = rows.toDF("item_id", "ts", "event_id")
    def flags(out: org.apache.spark.sql.DataFrame) =
      out.select(col("event_id"), col("current"))
        .as[(Long, Int)].collect().toMap
    assert(
      flags(Versioning.withCurrentFlagAgg(df, "item_id", "ts",
        "event_id")) ===
      flags(Versioning.withCurrentFlag(df, "item_id", "ts",
        "event_id")))
    // NULL business keys form their own stratum in BOTH forms (the
    // r12 advice finding: a plain equi-join back would silently drop
    // them where the window's partitionBy keeps them, one current=1)
    val withNullKey = rows.toDF("item_id", "ts", "event_id")
      .unionByName(Seq(
        (Option.empty[Long], ts("2024-01-03 00:00:00"), 900L),
        (Option.empty[Long], ts("2024-01-05 00:00:00"), 901L))
        .toDF("item_id", "ts", "event_id"))
    val aggN = flags(Versioning.withCurrentFlagAgg(withNullKey,
      "item_id", "ts", "event_id"))
    assert(aggN === flags(Versioning.withCurrentFlag(withNullKey,
      "item_id", "ts", "event_id")))
    assert(aggN(900L) === 0 && aggN(901L) === 1,
      "the null-keyed stratum must survive with one current row")
  }

  test("W1: equal timestamps break ties on the tiebreak column (retry " +
      "re-enqueue semantics, PodioApiGateway.py:153-156: last event wins)") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L),
      (1L, ts("2024-01-01 00:00:00"), 11L)
    ).toDF("item_id", "ts", "event_id")
    val out = Versioning.withCurrentFlag(df, "item_id", "ts", "event_id")
      .select("event_id", "current").as[(Long, Int)].collect().toMap
    assert(out === Map(10L -> 0, 11L -> 1))
  }

  test("SCD2 invariant: exactly one current=1 per key, any event order") {
    val gen = Gen.listOfN(40, for {
      key <- Gen.choose(1L, 5L)
      secs <- Gen.choose(0L, 100L)
      id <- Gen.choose(0L, 1000000L)
    } yield (key, new Timestamp(1700000000000L + secs * 1000), id))
    // scalatestplus bridge isn't on the classpath; sample the generator
    // directly with fixed seeds for reproducibility.
    for (seed <- 0L until 10L) {
      val rows = gen.apply(Gen.Parameters.default, Seed(seed)).get.distinct
      assert(rows.nonEmpty)
      val df = rows.toDF("item_id", "ts", "event_id")
      val flagged = Versioning.withCurrentFlag(df, "item_id", "ts", "event_id")
      assert(Versioning.invariantViolations(flagged, "item_id").count() === 0,
        s"seed=$seed")
    }
  }

  test("W2: latestSnapshot returns one row per key, the newest") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "old"),
      (1L, ts("2024-01-03 00:00:00"), 11L, "new"),
      (2L, ts("2024-01-02 00:00:00"), 12L, "only")
    ).toDF("item_id", "ts", "event_id", "payload")
    val out = Versioning.latestSnapshot(df, "item_id", "ts", "event_id")
      .select("item_id", "payload").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "new", 2L -> "only"))
  }

  test("T9: softDelete marks matching keys, keeps rows") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("item_id", "v")
    val dels = Seq(Tuple1(2L)).toDF("item_id")
    val out = Versioning.softDelete(df, dels, "item_id")
      .select("item_id", "deleted").as[(Long, Boolean)].collect().toMap
    assert(out === Map(1L -> false, 2L -> true, 3L -> false))
  }

  test("T9: softDelete coalesces a NULL prior deleted flag — legacy " +
      "rows (null-filled under mergeSchema) never stay NULL") {
    // history written before the deleted column existed reads back
    // with NULL deleted; false || NULL = NULL would silently drop
    // those rows from any !deleted live-view filter
    val hist = Seq(
      (1L, "a", Some(true)),  // already tombstoned
      (2L, "b", None),        // legacy row: null deleted
      (3L, "c", Some(false))
    ).toDF("item_id", "v", "deleted")
    val out = Versioning.softDelete(hist,
      Seq(Tuple1(3L)).toDF("item_id"), "item_id")
    val flags = out.select("item_id", "deleted")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getBoolean(1))).toMap
    assert(flags === Map(1L -> true, 2L -> false, 3L -> true),
      "no NULL flags may survive softDelete")
  }

  test("invariantViolations also flags keys with ZERO current rows " +
      "(the all-demoted failure mode a current=1 pre-filter would hide)") {
    val df = Seq(
      (1L, 1), (1L, 0),          // healthy
      (7L, 0), (7L, 0), (7L, 0), // zero current — must be flagged
      (9L, 1), (9L, 1)           // two current — must be flagged
    ).toDF("item_id", "current")
    val bad = Versioning.invariantViolations(df, "item_id")
      .select("item_id").as[Long].collect().sorted.toSeq
    assert(bad === Seq(7L, 9L))
  }

  test("T9: incremental softDelete tombstones only the current version " +
      "and never un-deletes earlier batches") {
    val hist = Seq(
      (1L, 0, "v1"), (1L, 1, "v2"),
      (2L, 0, "w1"), (2L, 1, "w2"),
      (3L, 1, "x1")
    ).toDF("item_id", "current", "payload")
    val afterB1 = Versioning.softDelete(hist,
      Seq(Tuple1(1L)).toDF("item_id"), "item_id")
    // only key 1's CURRENT version is tombstoned; its history is not
    val b1 = afterB1.select("item_id", "current", "deleted")
      .as[(Long, Int, Boolean)].collect().toSet
    assert(b1.contains((1L, 1, true)) && b1.contains((1L, 0, false)))
    // batch 2 deletes key 3; key 1's tombstone must survive
    val afterB2 = Versioning.softDelete(afterB1,
      Seq(Tuple1(3L)).toDF("item_id"), "item_id")
    val b2 = afterB2.filter(col("deleted"))
      .select("item_id").as[Long].collect().sorted.toSeq
    assert(b2 === Seq(1L, 3L), "earlier tombstones must persist")
  }

  test("pruneVersions keeps the newest keepLast versions per key, " +
      "ties broken like the current-flag window") {
    val hist = Seq(
      (1L, 10L, 100L, "a"), (1L, 20L, 101L, "b"), (1L, 30L, 102L, "c"),
      (1L, 30L, 103L, "d"), // tie on ts=30 → event_id decides
      (2L, 5L, 200L, "e")
    ).toDF("item_id", "ts", "event_id", "payload")
    val kept = Versioning.pruneVersions(hist, "item_id", "ts", "event_id", 2)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(102L, 103L, 200L),
      "key 1 keeps the two newest (ts=30 pair), key 2 keeps its only row")
    intercept[IllegalArgumentException] {
      Versioning.pruneVersions(hist, "item_id", "ts", "event_id", 0)
    }
  }

  test("snapshotAsOf reconstructs per-key state at a past instant; " +
      "keys born later are absent") {
    val hist = Seq(
      (1L, 10L, 100L, "old"), (1L, 20L, 101L, "mid"), (1L, 30L, 102L, "new"),
      (2L, 25L, 200L, "late-born")
    ).toDF("item_id", "ts", "event_id", "payload")
    val asOf = Versioning.snapshotAsOf(hist, "item_id", "ts", "event_id",
        lit(20L))
      .select("item_id", "payload").as[(Long, String)].collect().toMap
    assert(asOf === Map(1L -> "mid"), "key 2 did not exist at t=20")
  }

  test("versionDiff classifies added/changed/unchanged/removed/" +
      "restored between two sync instants") {
    val hist = Seq(
      // key 1: v100 at t10, v101 at t30 → changed between t20 and t40
      (1L, 10L, 100L, false), (1L, 30L, 101L, false),
      // key 2: only v200 at t5 → unchanged
      (2L, 5L, 200L, false),
      // key 3: born at t25 → added
      (3L, 25L, 300L, false),
      // key 4: live at t10, tombstoned at t35 → removed
      (4L, 10L, 400L, false), (4L, 35L, 401L, true),
      // key 5: tombstoned at t15, restored at t30 → restored
      (5L, 15L, 500L, true), (5L, 30L, 501L, false),
      // key 6: born and tombstoned between the instants → live at
      // NEITHER snapshot, so no diff row (not a spurious 'added')
      (6L, 25L, 600L, false), (6L, 35L, 601L, true),
      // key 7: dead at both instants → no diff row
      (7L, 10L, 700L, true)
    ).toDF("item_id", "ts", "event_id", "deleted")
    val diff = Versioning.versionDiff(hist, "item_id", "ts", "event_id",
        lit(20L), lit(40L))
      .select("item_id", "change_type").as[(Long, String)]
      .collect().toMap
    assert(diff === Map(1L -> "changed", 2L -> "unchanged",
      3L -> "added", 4L -> "removed", 5L -> "restored"))
  }

  test("K3: auditStamp adds a completion timestamp column") {
    val df = Seq(Tuple1(1L)).toDF("event_id")
    val out = Versioning.auditStamp(df)
    assert(out.columns.contains("completed_timestamp"))
    assert(out.filter(col("completed_timestamp").isNotNull).count() === 1)
  }

  // ----------------------- hard-forget (r15 verdict item 3)

  private def historyRows(tag: String) = Seq(
    (1L, ts("2024-01-01 00:00:00"), 10L, s"$tag-a0", 0),
    (1L, ts("2024-01-02 00:00:00"), 11L, s"$tag-a1", 1),
    (2L, ts("2024-01-01 00:00:00"), 12L, s"$tag-b0", 1),
    (3L, ts("2024-01-03 00:00:00"), 13L, s"$tag-c0", 0),
    (3L, ts("2024-01-04 00:00:00"), 14L, s"$tag-c1", 1)
  ).toDF("item_id", "ts", "event_id", "payload", "current")

  test("forget erases EVERY version of the named keys from history, " +
      "audit, and queue physically; survivors are untouched " +
      "byte-for-byte (one-current invariant intact); the ledger " +
      "records the erased ids; replay removes nothing and never " +
      "grows the ledger; re-ingest of an erased key is permitted by " +
      "design (source-assigned keys) with the ledger as the " +
      "compliance record") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_forget")
    try {
      val hist = tmp.resolve("history").toString
      val audit = tmp.resolve("audit").toString
      val queue = tmp.resolve("queue").toString
      historyRows("h").write.parquet(hist)
      historyRows("a").drop("current").write.parquet(audit)
      Seq((1L, 90L), (3L, 91L), (3L, 92L))
        .toDF("item_id", "event_id").write.parquet(queue)
      val removed = Versioning.forget(spark,
        Seq(1L, 1L, 99L).toDF("item_id"),
        Versioning.ForgetTargets(historyPath = Some(hist),
          auditPath = Some(audit), queuePath = Some(queue)))
      // 2 history versions + 2 audit rows + 1 queue row; the unknown
      // id 99 and the duplicate id are no-ops
      assert(removed === 5L)
      val afterHist = spark.read.parquet(hist)
      assert(afterHist.filter(col("item_id") === 1L).isEmpty,
        "every version of the erased key must be GONE")
      assert(afterHist.select("item_id", "ts", "event_id", "payload",
          "current").as[(Long, Timestamp, Long, String, Int)]
          .collect().toSet ===
        historyRows("h").filter(col("item_id") =!= 1L)
          .as[(Long, Timestamp, Long, String, Int)].collect().toSet,
        "survivors must be byte-identical")
      assert(Versioning.invariantViolations(afterHist, "item_id")
        .isEmpty, "one-current must hold for every surviving key")
      assert(spark.read.parquet(audit).filter(col("item_id") === 1L)
        .isEmpty && spark.read.parquet(queue)
        .filter(col("item_id") === 1L).isEmpty,
        "the audit trail and pending queue must be erased too")
      // the bytes are gone from disk, not just masked: no parquet
      // data file under the history root still holds the erased
      // payloads (the ledger sibling holds only ids)
      val leaked = spark.read.parquet(hist)
        .filter(col("payload").startsWith("h-a")).count()
      assert(leaked === 0L)
      // compliance ledger: erased ids recorded (incl. the unknown id
      // — the INTENT is the evidence), deduped
      val ledger = spark.read.parquet(s"$hist/${Versioning.ForgottenDir}")
        .as[Long].collect().toSet
      assert(ledger === Set(1L, 99L))
      // idempotent replay: nothing removed, nothing regrown
      assert(Versioning.forget(spark, Seq(1L, 99L).toDF("item_id"),
        Versioning.ForgetTargets(historyPath = Some(hist),
          auditPath = Some(audit), queuePath = Some(queue))) === 0L)
      assert(spark.read.parquet(s"$hist/${Versioning.ForgottenDir}")
        .count() === 2L)
      // re-ingest of the erased key is allowed (re-consent), and the
      // ledger still witnesses the past erasure
      Seq((1L, ts("2024-02-01 00:00:00"), 50L, "h-new", 1))
        .toDF("item_id", "ts", "event_id", "payload", "current")
        .write.mode("append").parquet(hist)
      assert(spark.read.parquet(hist).filter(col("item_id") === 1L)
        .count() === 1L)
      assert(spark.read.parquet(s"$hist/${Versioning.ForgottenDir}")
        .as[Long].collect().toSet === Set(1L, 99L))
      // guards: empty target set and null keys are loud
      intercept[IllegalArgumentException] {
        Versioning.forget(spark, Seq(1L).toDF("item_id"),
          Versioning.ForgetTargets())
      }
      // a MULTI-level partitioned table erases through the same
      // dirty-LEAF-directory rewrite (r16 extension): both of key 1's
      // leaves (seg=1/current=0, seg=1/current=1) rewrite with key
      // 3's rows surviving; seg=0 never rewrites
      val part = tmp.resolve("multilevel").toString
      historyRows("p").withColumn("seg", col("item_id") % 2)
        .write.partitionBy("seg", "current").parquet(part)
      assert(Versioning.forget(spark, Seq(1L).toDF("item_id"),
        Versioning.ForgetTargets(historyPath = Some(part))) === 2L)
      val afterPart = spark.read.parquet(part)
      assert(afterPart.filter(col("item_id") === 1L).isEmpty)
      assert(afterPart.select("item_id", "event_id", "current")
        .as[(Long, Long, Int)].collect().toSet ===
        Set((2L, 12L, 1), (3L, 13L, 0), (3L, 14L, 1)),
        "survivors keep both partition values intact")
      intercept[Exception] {
        Versioning.forget(spark,
          spark.sql("SELECT CAST(NULL AS BIGINT) AS item_id"),
          Versioning.ForgetTargets(historyPath = Some(hist)))
      }
    } finally {
      new scala.reflect.io.Directory(tmp.toFile).deleteRecursively()
      ()
    }
  }

  test("forget on a SINGLE-level partitioned history (the 100 TB " +
      "layout): only dirty partition directories rewrite, survivors " +
      "keep their partition values byte-for-byte, a fully-dead " +
      "partition empties, replay removes nothing; a table partitioned " +
      "BY the key erases by whole-directory deletion") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_forget_pt")
    try {
      // partition column ≠ key: seg 0 holds keys {1 (2 rows), 2},
      // seg 1 holds key 3 (2 rows) — erasing keys 1 and 3 makes seg 0
      // DIRTY (rewrite, survivor 2 kept) and... seg 1 fully dead
      val hist = tmp.resolve("history").toString
      historyRows("h")
        .withColumn("seg", when(col("item_id") <= 2L, 0L).otherwise(1L))
        .write.partitionBy("seg").parquet(hist)
      val removed = Versioning.forget(spark,
        Seq(1L, 3L).toDF("item_id"),
        Versioning.ForgetTargets(historyPath = Some(hist)))
      assert(removed === 4L)
      val after = spark.read.parquet(hist)
      assert(after.select("item_id", "event_id", "payload", "current",
          "seg").as[(Long, Long, String, Int, Long)].collect().toSet
        === Set((2L, 12L, "h-b0", 1, 0L)),
        "only the survivor remains, partition value intact")
      // the untouched-partition discipline: survivors' original data
      // file is still the one on disk (no graftf- rewrite prefix
      // outside the dirty dirs would exist here since seg=0 WAS
      // dirty; assert the fully-dead seg=1 holds no data files)
      val fs = new org.apache.hadoop.fs.Path(hist)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val seg1 = new org.apache.hadoop.fs.Path(s"$hist/seg=1")
      // every pre-erase data file is GONE; what may remain is the
      // staged (empty, zero-row) survivor file under the run's prefix
      assert(!fs.exists(seg1) || fs.listStatus(seg1)
        .forall(st => !st.getPath.getName.endsWith(".parquet")
          || st.getPath.getName.startsWith("graftf-")),
        "the fully-dead partition must hold no pre-erase data files")
      // replay: nothing left to remove, ledger unchanged
      assert(Versioning.forget(spark, Seq(1L, 3L).toDF("item_id"),
        Versioning.ForgetTargets(historyPath = Some(hist))) === 0L)
      assert(spark.read.parquet(s"$hist/${Versioning.ForgottenDir}")
        .count() === 2L)
      // partitioned BY the key: whole-directory erasure
      val byKey = tmp.resolve("bykey").toString
      historyRows("k").write.partitionBy("item_id").parquet(byKey)
      assert(Versioning.forget(spark, Seq(1L, 99L).toDF("item_id"),
        Versioning.ForgetTargets(historyPath = Some(byKey))) === 2L)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(
        s"$byKey/item_id=1")), "the key's directory must be gone")
      assert(spark.read.parquet(byKey).select("item_id")
        .as[Long].collect().toSet === Set(2L, 3L))
      assert(Versioning.forget(spark, Seq(1L).toDF("item_id"),
        Versioning.ForgetTargets(historyPath = Some(byKey))) === 0L)
    } finally {
      new scala.reflect.io.Directory(tmp.toFile).deleteRecursively()
      ()
    }
  }

  test("forget on a DEEP key-partitioned history (key at level 2): " +
      "erasure is whole-directory deletion, emptied ancestor branches " +
      "are swept, replay converges; ragged nesting and mixed-column " +
      "levels refuse loudly before any erase") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_forget_ml")
    try {
      val fs = new org.apache.hadoop.fs.Path(tmp.toString)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // seg=0 holds item_id=2; seg=1 holds item_id∈{1,3} — erasing
      // keys 1 and 3 deletes both of seg=1's key directories and the
      // now-hollow seg=1 branch itself
      val byKey = tmp.resolve("bykey2").toString
      historyRows("k").withColumn("seg", col("item_id") % 2)
        .write.partitionBy("seg", "item_id").parquet(byKey)
      assert(Versioning.forget(spark, Seq(1L, 3L).toDF("item_id"),
        Versioning.ForgetTargets(historyPath = Some(byKey))) === 4L)
      assert(spark.read.parquet(byKey).select("item_id")
        .as[Long].collect().toSet === Set(2L))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(
        s"$byKey/seg=1")), "the emptied ancestor branch must be swept")
      assert(fs.exists(new org.apache.hadoop.fs.Path(
        s"$byKey/seg=0/item_id=2")), "the survivor's branch stays")
      assert(Versioning.forget(spark, Seq(1L, 3L).toDF("item_id"),
        Versioning.ForgetTargets(historyPath = Some(byKey))) === 0L)
      // crash window (r16 session review): a key-level erase that
      // died between deleting its doomed children and sweeping the
      // emptied ancestor leaves a HOLLOW branch — the documented
      // remedy (re-running forget) must prune it, not wedge on a
      // false ragged-nesting refusal
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$byKey/seg=3"))
      assert(Versioning.forget(spark, Seq(1L, 3L).toDF("item_id"),
        Versioning.ForgetTargets(historyPath = Some(byKey))) === 0L,
        "the replay over the hollow branch must converge")
      assert(spark.read.parquet(byKey).select("item_id")
        .as[Long].collect().toSet === Set(2L))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$byKey/seg=3")),
        "the walk must sweep the husk it pruned, not accumulate it")
      // hollowness at a DEEPER level (a 3-level erase that died after
      // deleting every leaf dir but before any ancestor sweep): the
      // whole tree holds zero data files and the replay must be a
      // 0-row no-op, never a truncated-levels rewrite that dies on
      // schema inference
      val deep = tmp.resolve("deephollow").toString
      historyRows("d").withColumn("seg", col("item_id") % 2)
        .withColumn("sub", col("event_id") % 2)
        .write.partitionBy("seg", "sub", "item_id").parquet(deep)
      fs.listStatus(new org.apache.hadoop.fs.Path(deep)).toSeq
        .filter(_.getPath.getName.startsWith("seg="))
        .flatMap(s => fs.listStatus(s.getPath).toSeq)
        .filter(_.getPath.getName.startsWith("sub="))
        .flatMap(s => fs.listStatus(s.getPath).toSeq)
        .filter(_.getPath.getName.startsWith("item_id="))
        .foreach { d => fs.delete(d.getPath, true); () }
      assert(Versioning.forget(spark, Seq(1L).toDF("item_id"),
        Versioning.ForgetTargets(historyPath = Some(deep))) === 0L,
        "an all-hollow deep tree must converge to a no-op")
      // ragged nesting: one branch of a single-level table nests
      // further — the tree walk refuses before any rewrite
      val ragged = tmp.resolve("ragged").toString
      historyRows("r").withColumn("seg", col("item_id") % 2)
        .write.partitionBy("seg").parquet(ragged)
      historyRows("r").drop("item_id").limit(1)
        .write.parquet(s"$ragged/seg=0/deep=1")
      val er = intercept[IllegalArgumentException] {
        Versioning.forget(spark, Seq(1L).toDF("item_id"),
          Versioning.ForgetTargets(historyPath = Some(ragged)))
      }
      assert(er.getMessage.contains("ragged"))
      // mixed columns at one level refuse
      val mixed = tmp.resolve("mixed").toString
      historyRows("m").withColumn("seg", col("item_id") % 2)
        .write.partitionBy("seg").parquet(mixed)
      historyRows("m").drop("item_id").limit(1)
        .write.parquet(s"$mixed/other=9")
      val em = intercept[IllegalArgumentException] {
        Versioning.forget(spark, Seq(1L).toDF("item_id"),
          Versioning.ForgetTargets(historyPath = Some(mixed)))
      }
      assert(em.getMessage.contains("mixes partition columns"))
    } finally {
      new scala.reflect.io.Directory(tmp.toFile).deleteRecursively()
      ()
    }
  }

  test("forget cascade ledger: ONE idempotent row per (ids, tables) " +
      "cascade appended after every table's swap landed; the " +
      "crash-repair replay absorbs instead of duplicating; a cascade " +
      "over different tables is a distinct audit row") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_forget_lg")
    try {
      val hist = tmp.resolve("history").toString
      val audit = tmp.resolve("audit").toString
      val ledger = tmp.resolve("ledger").toString
      historyRows("h").write.parquet(hist)
      historyRows("a").drop("current").write.parquet(audit)
      val t2 = Versioning.ForgetTargets(historyPath = Some(hist),
        auditPath = Some(audit))
      assert(Versioning.forget(spark, Seq(1L).toDF("item_id"), t2,
        ledgerPath = Some(ledger)) === 4L)
      // replay (removes nothing) absorbs into the same ledger row
      assert(Versioning.forget(spark, Seq(1L).toDF("item_id"), t2,
        ledgerPath = Some(ledger)) === 0L)
      val rows = spark.read.parquet(ledger)
      assert(rows.count() === 1L)
      val r = rows.head()
      assert(r.getAs[Seq[String]]("tables") === Seq("audit", "history"),
        "table roles recorded sorted")
      assert(r.getAs[Seq[String]]("item_ids") === Seq("1"))
      assert(r.getAs[Long]("n_ids") === 1L)
      // same ids, history-only cascade: a DISTINCT audit event
      assert(Versioning.forget(spark, Seq(1L).toDF("item_id"),
        Versioning.ForgetTargets(historyPath = Some(hist)),
        ledgerPath = Some(ledger)) === 0L)
      assert(spark.read.parquet(ledger).count() === 2L)
    } finally {
      new scala.reflect.io.Directory(tmp.toFile).deleteRecursively()
      ()
    }
  }

  test("forget writer-lock discipline: an erase racing a live CDC " +
      "merge is refused in BOTH directions — forget refuses while " +
      "another writer holds the table, and mergeBatchPruned / " +
      "writeMergedBuckets refuse while an erase holds it; a crashed " +
      "erase's stale lock is cleared by breakStaleLock = true") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_forget_lk")
    try {
      val hist = tmp.resolve("history").toString
      historyRows("h").write.parquet(hist)
      val fs = new org.apache.hadoop.fs.Path(hist)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker = new org.apache.hadoop.fs.Path(hist,
        graft.ml.Maintenance.MaintainingMarker)
      // another writer holds the table → forget refuses loudly
      fs.create(marker, false).close()
      val ef = intercept[IllegalStateException] {
        Versioning.forget(spark, Seq(1L).toDF("item_id"),
          Versioning.ForgetTargets(historyPath = Some(hist)))
      }
      assert(ef.getMessage.contains("writer lock"))
      // ...and the erase holding the table refuses the merge writers
      val batch = Seq((1L, ts("2024-03-01 00:00:00"), 80L))
        .toDF("item_id", "ts", "event_id")
      val em = intercept[IllegalStateException] {
        graft.streaming.CdcPipeline.mergeBatchPruned(
          spark, hist, batch, "item_id", 4)
      }
      assert(em.getMessage.contains("writer lock"))
      val ew = intercept[IllegalStateException] {
        graft.streaming.CdcPipeline.writeMergedBuckets(
          batch.withColumn("key_bucket", lit(0))
            .withColumn("current", lit(1)), hist, 4)
      }
      assert(ew.getMessage.contains("writer lock"))
      // nothing was erased or merged while refused
      assert(spark.read.parquet(hist).count() === 5L)
      // the stale-lock remedy: breakStaleLock re-enters, erases, and
      // RELEASES the lock (the next merge write is free to proceed)
      assert(Versioning.forget(spark, Seq(1L).toDF("item_id"),
        Versioning.ForgetTargets(historyPath = Some(hist)),
        breakStaleLock = true) === 2L)
      assert(!fs.exists(marker), "forget must release its lock")
      assert(spark.read.parquet(hist).filter(col("item_id") === 1L)
        .isEmpty)
    } finally {
      new scala.reflect.io.Directory(tmp.toFile).deleteRecursively()
      ()
    }
  }

  test("forget crash contract: a COMMITTED stage left by a crashed " +
      "apply is finished by the next call before the new erase " +
      "proceeds; an UNCOMMITTED stage is debris and is discarded — " +
      "both converge to exactly the clean-forget state") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_forget_cr")
    try {
      // the clean reference
      val ref = tmp.resolve("ref").toString
      historyRows("x").write.parquet(ref)
      Versioning.forget(spark, Seq(3L).toDF("item_id"),
        Versioning.ForgetTargets(historyPath = Some(ref)))
      def state(p: String) = spark.read.parquet(p)
        .select("item_id", "event_id", "current")
        .as[(Long, Long, Int)].collect().toSet
      // crash AFTER stage commit, BEFORE the apply: reconstruct the
      // exact on-disk state — survivors staged, stage id committed,
      // old data files still in place — then replay the same call
      val hist = tmp.resolve("history").toString
      historyRows("x").write.parquet(hist)
      val fs = new org.apache.hadoop.fs.Path(hist)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val stage = s"$hist/${Versioning.ForgetStageDir}"
      spark.read.parquet(hist).filter(col("item_id") =!= 3L)
        .write.parquet(stage)
      graft.sources.Markers.write(fs,
        new org.apache.hadoop.fs.Path(stage, "_GRAFT_STAGE_ID"),
        "deadbeef")
      assert(Versioning.forget(spark, Seq(3L).toDF("item_id"),
        Versioning.ForgetTargets(historyPath = Some(hist))) === 0L,
        "the replay finishes the committed stage; the erase itself " +
          "then finds nothing left to remove")
      assert(state(hist) === state(ref))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(stage)))
      // crash BEFORE the stage committed: staged files but no
      // _GRAFT_STAGE_ID — debris; the replay discards it and erases
      // through a fresh stage
      val hist2 = tmp.resolve("history2").toString
      historyRows("x").write.parquet(hist2)
      spark.read.parquet(hist2).filter(col("item_id") =!= 3L)
        .write.parquet(s"$hist2/${Versioning.ForgetStageDir}")
      assert(Versioning.forget(spark, Seq(3L).toDF("item_id"),
        Versioning.ForgetTargets(historyPath = Some(hist2))) === 2L)
      assert(state(hist2) === state(ref))
    } finally {
      new scala.reflect.io.Directory(tmp.toFile).deleteRecursively()
      ()
    }
  }
}
