package graft

import java.nio.file.Files

import graft.sinks.VersionedStore
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col

/** The graftstore SQL front door (GraftSqlParser + GraftDmlRule): the
  * row-level commands Spark parses natively (DELETE/UPDATE/MERGE INTO)
  * and the injected maintenance verbs (OPTIMIZE/VACUUM/DESCRIBE
  * HISTORY), all driven through `spark.sql` against `CREATE TABLE ...
  * USING graftstore` tables. The gates that matter:
  *  (1) every command lands on the TRANSACTIONAL commit path — version
  *      bumps by exactly one, the stream ledger carries, the row-level
  *      change feed labels the effect;
  *  (2) results match the Scala API's semantics (same rows the
  *      equivalent deleteWhere/updateWhere/mergeInto would leave);
  *  (3) unsupported shapes fail loudly (conditional MERGE clauses,
  *      subquery conditions, DML on a time-traveled relation) — never
  *      silently half-execute. */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshTable(): (String, String) = {
    n += 1
    val root = Files.createTempDirectory("graft-sql").toString
    val tbl = s"gsql_$n"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    (root, tbl)
  }

  /** Seed rows 1..6 with a ledger entry (as a stream batch commit would
    * leave), register the catalog table. */
  private def seeded(): (String, String) = {
    val (root, tbl) = freshTable()
    val df = (1 to 6).map(i => (i.toLong, i * 10L, s"g${i % 2}"))
      .toDF("id", "v", "grp")
    VersionedStore.commit(df, root, statsCols = Seq("id"),
      meta = Map("batch.w1" -> "7"))
    spark.sql(s"CREATE TABLE $tbl USING graftstore OPTIONS (path '$root')")
    (root, tbl)
  }

  test("DELETE FROM: rows gone, version bumps, ledger carries, CDF labels deletes") {
    val (root, tbl) = seeded()
    val v0 = VersionedStore.currentVersion(spark, root)
    val out = spark.sql(s"DELETE FROM $tbl WHERE id >= 5").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(v0 + 1))
    assert(VersionedStore.currentVersion(spark, root) == v0 + 1)
    // effect matches deleteWhere semantics
    assert(spark.sql(s"SELECT id FROM $tbl ORDER BY id").as[Long].collect()
      .toSeq == Seq(1L, 2L, 3L, 4L))
    // transactional path: the exactly-once stream ledger rides through
    assert(VersionedStore.currentMeta(spark, root).get("batch.w1").contains("7"))
    // row-level feed sees exactly the two deletes
    val feed = VersionedStore.readRowChanges(spark, root, v0).get
      .filter(col("_change_type") === "delete")
    assert(feed.select("id").as[Long].collect().sorted.toSeq == Seq(5L, 6L))
  }

  test("UPDATE SET: pre-update RHS semantics, WHERE=NULL untouched, CDF pairs") {
    val (root, tbl) = seeded()
    val v0 = VersionedStore.currentVersion(spark, root)
    val out = spark.sql(
      s"UPDATE $tbl SET v = v + 1, id = id WHERE grp = 'g1' AND id <= 3").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(v0 + 1))
    val got = spark.sql(s"SELECT id, v FROM $tbl ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 11L), (2L, 20L), (3L, 31L), (4L, 40L),
      (5L, 50L), (6L, 60L)))
    val feed = VersionedStore.readRowChanges(spark, root, v0).get
    val post = feed.filter(col("_change_type") === "update_postimage")
      .select("id", "v").as[(Long, Long)].collect().sorted.toSeq
    assert(post == Seq((1L, 11L), (3L, 31L)))
  }

  test("UPDATE without WHERE touches every row") {
    val (root, tbl) = seeded()
    spark.sql(s"UPDATE $tbl SET v = 0").collect()
    assert(spark.sql(s"SELECT sum(v) FROM $tbl").as[Long].head() == 0L)
  }

  test("MERGE INTO: whole-row upsert via SET * / INSERT *, version bumps once") {
    val (root, tbl) = seeded()
    val v0 = VersionedStore.currentVersion(spark, root)
    Seq((5L, 555L, "gX"), (9L, 999L, "gY")).toDF("id", "v", "grp")
      .createOrReplaceTempView("gsql_src")
    val out = spark.sql(
      s"""MERGE INTO $tbl t USING gsql_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(v0 + 1))
    val got = spark.sql(s"SELECT id, v, grp FROM $tbl ORDER BY id")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 10L, "g1"), (2L, 20L, "g0"), (3L, 30L, "g1"),
      (4L, 40L, "g0"), (5L, 555L, "gX"), (6L, 60L, "g0"), (9L, 999L, "gY")))
    assert(VersionedStore.currentMeta(spark, root).get("batch.w1").contains("7"))
  }

  test("MERGE INTO: explicit full-row assignments accepted, partial SET " +
       "lowers to the clause path") {
    val (root, tbl) = seeded()
    Seq((2L, 222L, "gZ")).toDF("id", "v", "grp")
      .createOrReplaceTempView("gsql_src2")
    spark.sql(
      s"""MERGE INTO $tbl t USING gsql_src2 s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET id = s.id, v = s.v, grp = s.grp
         |WHEN NOT MATCHED THEN INSERT (id, v, grp) VALUES (s.id, s.v, s.grp)
         |""".stripMargin).collect()
    assert(spark.sql(s"SELECT v FROM $tbl WHERE id = 2").as[Long].head() == 222L)
    // a partial-column SET updates only the named column — grp survives
    val v0 = VersionedStore.currentVersion(spark, root)
    spark.sql(
      s"""MERGE INTO $tbl t USING gsql_src2 s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v + t.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(VersionedStore.currentVersion(spark, root) == v0 + 1)
    assert(spark.sql(s"SELECT v, grp FROM $tbl WHERE id = 2")
      .as[(Long, String)].head() == ((444L, "gZ")))
  }

  test("MERGE INTO conditional clauses: first-match-wins UPDATE/DELETE, " +
       "conditional INSERT, CDF labels, ledger carries") {
    val (root, tbl) = seeded()  // ids 1..6, v = id*10, grp = g(id%2)
    val v0 = VersionedStore.currentVersion(spark, root)
    // sources matched: 1 (update branch: s.v >= 100), 2 (delete branch),
    // 3 (no clause applies -> survives); not matched: 8 (insert cond
    // true), 9 (insert cond false -> dropped)
    Seq((1L, 100L, "gU"), (2L, 5L, "gD"), (3L, 7L, "gN"),
        (8L, 800L, "keep"), (9L, 900L, "skip"))
      .toDF("id", "v", "grp").createOrReplaceTempView("gsql_cond")
    val out = spark.sql(
      s"""MERGE INTO $tbl t USING gsql_cond s ON t.id = s.id
         |WHEN MATCHED AND s.v >= 100 THEN UPDATE SET v = t.v + s.v
         |WHEN MATCHED AND s.v < 6 THEN DELETE
         |WHEN NOT MATCHED AND s.grp = 'keep' THEN INSERT *""".stripMargin)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(v0 + 1),
      "three clauses, one transactional commit")
    val got = spark.sql(s"SELECT id, v, grp FROM $tbl ORDER BY id")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 110L, "g1"),   // updated: t.v + s.v, grp untouched (partial SET)
      (3L, 30L, "g1"),    // matched, no clause condition true: unchanged
      (4L, 40L, "g0"), (5L, 50L, "g1"), (6L, 60L, "g0"),
      (8L, 800L, "keep")  // conditional insert; id 9 filtered out; id 2 deleted
    ), s"got $got")
    // transactional path: ledger carried, row-level feed labels the
    // multiset delta (merge commits label insert/delete)
    assert(VersionedStore.currentMeta(spark, root).get("batch.w1").contains("7"))
    val feed = VersionedStore.readRowChanges(spark, root, v0).get
      .groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // delete: id 2's old row + id 1's preimage; insert: id 1's postimage
    // + id 8's new row
    assert(feed == Map("delete" -> 2L, "insert" -> 2L), s"feed: $feed")
  }

  test("MERGE INTO insert-only (WHEN NOT MATCHED alone) appends without " +
       "rewriting any dir; no-effect merge is a version-less no-op") {
    val (root, tbl) = seeded()
    val v0 = VersionedStore.currentVersion(spark, root)
    val dirsBefore = VersionedStore.prunedDirs(spark, root, v0, Seq.empty).toSet
    Seq((1L, 111L, "gI"), (8L, 888L, "gI")).toDF("id", "v", "grp")
      .createOrReplaceTempView("gsql_insonly")
    spark.sql(
      s"""MERGE INTO $tbl t USING gsql_insonly s ON t.id = s.id
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(VersionedStore.currentVersion(spark, root) == v0 + 1)
    val dirsAfter = VersionedStore.prunedDirs(spark, root, v0 + 1, Seq.empty).toSet
    assert(dirsBefore.subsetOf(dirsAfter) && (dirsAfter -- dirsBefore).size == 1,
      "insert-only merge must append one dir and rewrite none")
    // matched row 1 untouched (no matched clause), unmatched row 8 inserted
    assert(spark.sql(s"SELECT v FROM $tbl WHERE id IN (1, 8) ORDER BY id")
      .as[Long].collect().toSeq == Seq(10L, 888L))
    // a merge whose every row matches (nothing to insert) commits nothing
    spark.sql(
      s"""MERGE INTO $tbl t USING (SELECT 1 AS id, 5 AS v, 'x' AS grp) s
         |ON t.id = s.id
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(VersionedStore.currentVersion(spark, root) == v0 + 1,
      "an all-matched insert-only merge must be a version-less no-op")
  }

  test("MERGE INTO clause-shape guards fail loudly") {
    val (_, tbl) = seeded()
    Seq((1L, 1L, "g")).toDF("id", "v", "grp")
      .createOrReplaceTempView("gsql_guard")
    // non-final unconditional matched clause: unreachable successors.
    // Spark's own parser rejects this shape (NON_LAST_MATCHED_CLAUSE_
    // OMIT_CONDITION); the rule keeps its twin guard for belt-and-braces.
    val e1 = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $tbl t USING gsql_guard s ON t.id = s.id
           |WHEN MATCHED THEN DELETE
           |WHEN MATCHED AND s.v > 0 THEN UPDATE SET v = s.v
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    }
    assert(e1.getMessage.contains("LAST WHEN MATCHED")
      || e1.getMessage.contains("can omit the condition"))
    // a BY SOURCE condition referencing the source side is rejected (an
    // unmatched-by-source row has no source side; Delta rejects the same)
    val e2 = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $tbl t USING gsql_guard s ON t.id = s.id
           |WHEN MATCHED THEN DELETE
           |WHEN NOT MATCHED BY SOURCE AND s.v > 0 THEN DELETE""".stripMargin)
        .collect()
    }
    // caught at lowering (resolved s-refs) or at the store op (an
    // s-qualified reference the analyzer left unresolved — BY SOURCE
    // conditions have no source scope to resolve against)
    assert(e2.getMessage.contains("columns only"), e2.getMessage)
    // an INSERT column outside the target schema is rejected loudly
    val e3 = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $tbl t USING gsql_guard s ON t.id = s.id
           |WHEN NOT MATCHED THEN INSERT (nope) VALUES (s.v)""".stripMargin)
        .collect()
    }
    assert(e3.getMessage.toLowerCase.contains("nope"))
  }

  test("MERGE INSERT with a repeated column is rejected (Delta rejects " +
       "it; .toMap would silently take the last assignment)") {
    val (root, tbl) = seeded()
    Seq((9L, 900L, "gI")).toDF("id", "v", "grp")
      .createOrReplaceTempView("gsql_dupins")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $tbl t USING gsql_dupins s ON t.id = s.id
           |WHEN NOT MATCHED THEN INSERT (v, v) VALUES (s.v, s.v + 1)
           |""".stripMargin).collect()
    }
    // the analyzer may reject the repeated assignment itself; if the
    // shape reaches the lowering, the lowering must (not .toMap it away)
    assert(e.getMessage.toLowerCase.contains("duplicate") ||
      e.getMessage.toLowerCase.contains("multiple"),
      s"expected a duplicate-column rejection, got: ${e.getMessage}")
    assert(VersionedStore.read(spark, root).get.filter("id = 9").count() === 0L,
      "the rejected statement must not have committed")
  }

  test("MERGE INTO WHEN NOT MATCHED BY SOURCE (sync-to-source) + partial " +
       "INSERT: conditional update/delete of unmatched rows, omitted " +
       "insert columns NULL, CDF populations, ledger carries") {
    val (root, tbl) = seeded()  // ids 1..6, v = id*10, grp = g(id%2)
    val v0 = VersionedStore.currentVersion(spark, root)
    // source: 1-2 matched (update), 8 not matched (partial insert);
    // target-only rows 3..6: BY SOURCE delete for grp g0 (ids 4, 6),
    // BY SOURCE update for v >= 50 (id 5); id 3 untouched (no clause)
    Seq((1L, 100L, "gU"), (2L, 200L, "gU"), (8L, 800L, "gI"))
      .toDF("id", "v", "grp").createOrReplaceTempView("gsql_bys")
    val out = spark.sql(
      s"""MERGE INTO $tbl t USING gsql_bys s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v + 1)
         |WHEN NOT MATCHED BY SOURCE AND t.grp = 'g0' THEN DELETE
         |WHEN NOT MATCHED BY SOURCE AND t.v >= 50 THEN UPDATE SET v = t.v + 7
         |""".stripMargin).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(v0 + 1),
      "four clause families, one transactional commit")
    val got = spark.sql(s"SELECT id, v, grp FROM $tbl ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.toString))).toSeq
    assert(got == Seq(
      (1L, 100L, Some("g1")),  // matched update (partial SET, grp kept)
      (2L, 200L, Some("g0")),  // matched update
      (3L, 30L, Some("g1")),   // unmatched, no BY SOURCE clause applies
      (5L, 57L, Some("g1")),   // BY SOURCE update (second clause)
      (8L, 801L, None)         // partial insert: grp omitted -> NULL
    ), s"got $got")             // ids 4, 6 (g0): BY SOURCE delete
    assert(VersionedStore.currentMeta(spark, root).get("batch.w1").contains("7"))
    // CDF populations (merge commits label insert/delete): deletes =
    // ids 4, 6 + preimages of 1, 2, 5; inserts = postimages of 1, 2, 5
    // + the new id 8
    val feed = VersionedStore.readRowChanges(spark, root, v0).get
      .groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(feed == Map("delete" -> 5L, "insert" -> 4L), s"feed: $feed")
    // an EMPTY source applies BY SOURCE clauses to every target row
    spark.sql(
      s"""MERGE INTO $tbl t USING (SELECT * FROM gsql_bys WHERE id < 0) s
         |ON t.id = s.id
         |WHEN NOT MATCHED BY SOURCE AND t.v > 150 THEN DELETE""".stripMargin)
      .collect()
    assert(spark.sql(s"SELECT id FROM $tbl ORDER BY id").as[Long].collect()
      .toSeq == Seq(1L, 3L, 5L), "ids 2 (v=200) and 8 (v=801) deleted")
    // the whole-row upsert shape (SET * / INSERT *) COMBINED with a BY
    // SOURCE clause leaves its dedicated single-pass path and lowers to
    // the clauses rewrite — Delta's full sync-table-to-source statement
    spark.sql(
      s"""MERGE INTO $tbl t USING gsql_bys s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin).collect()
    val synced = spark.sql(s"SELECT id, v, grp FROM $tbl ORDER BY id")
      .as[(Long, Long, String)].collect().toSeq
    assert(synced == Seq((1L, 100L, "gU"), (2L, 200L, "gU"), (8L, 800L, "gI")),
      s"table must now equal the source exactly: $synced")
  }

  test("OPTIMIZE reproduces the table's recorded stats columns — " +
       "maintenance must never degrade data skipping") {
    val (root, tbl) = seeded() // statsCols = id
    VersionedStore.commitAppend(Seq((100L, 1000L, "g0")).toDF("id", "v", "grp"),
      root, statsCols = Seq("id"))
    assert(VersionedStore.recordedStatsCols(spark, root) === Seq("id"))
    // plain OPTIMIZE (compaction): the compacted dir must carry id stats
    spark.sql(s"OPTIMIZE $tbl").collect()
    assert(VersionedStore.recordedStatsCols(spark, root) === Seq("id"),
      "plain OPTIMIZE dropped the recorded stats request")
    // CLUSTER BY a DIFFERENT column: both the cluster column and the
    // previously recorded one must survive
    spark.sql(s"OPTIMIZE $tbl CLUSTER BY (v) INTO 2 BUCKETS").collect()
    val after = VersionedStore.recordedStatsCols(spark, root).toSet
    assert(after === Set("id", "v"),
      s"CLUSTER BY must add its column and keep the recorded ones: $after")
    // and the id point probe still prunes post-OPTIMIZE
    val cur = VersionedStore.currentVersion(spark, root)
    val all = VersionedStore.prunedDirs(spark, root, cur, Seq.empty)
    val hit = VersionedStore.prunedDirs(spark, root, cur,
      Seq(VersionedStore.ColRange("id", Some("100"), Some("100"))))
    assert(hit.size < all.size,
      s"id skipping must survive OPTIMIZE: ${hit.size} of ${all.size} dirs kept")
  }

  test("OPTIMIZE: plain compaction and CLUSTER BY both commit a version") {
    val (root, tbl) = seeded()
    // a second dir so compaction has something to fold
    VersionedStore.commitAppend(Seq((7L, 70L, "g1")).toDF("id", "v", "grp"),
      root, statsCols = Seq("id"))
    val v0 = VersionedStore.currentVersion(spark, root)
    val c = spark.sql(s"OPTIMIZE $tbl").collect()
    assert(c.map(_.getLong(0)).toSeq == Seq(v0 + 1))
    assert(spark.sql(s"SELECT count(*) FROM $tbl").as[Long].head() == 7L)
    val z = spark.sql(s"OPTIMIZE $tbl CLUSTER BY (id) INTO 2 BUCKETS").collect()
    assert(z.map(_.getLong(0)).toSeq == Seq(v0 + 2))
    assert(spark.sql(s"SELECT sum(v) FROM $tbl").as[Long].head() ==
      (1 to 7).map(_ * 10L).sum)
  }

  test("VACUUM reaps expired dirs; DESCRIBE HISTORY lists versions with meta") {
    val (root, tbl) = seeded()
    spark.sql(s"DELETE FROM $tbl WHERE id = 1").collect()
    val hist = spark.sql(s"DESCRIBE HISTORY $tbl").collect()
    assert(hist.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(hist.forall(_.getString(2).contains("batch.w1=7")))
    VersionedStore.expire(spark, root, keepLast = 1)
    // bare VACUUM keeps the 7-day safety floor (fresh dirs survive);
    // RETAIN 0 HOURS is the explicit maintenance-window reap
    spark.sql(s"VACUUM $tbl").collect()
    spark.sql(s"VACUUM $tbl RETAIN 0 HOURS").collect()
    // store still reads clean after the reap
    assert(spark.sql(s"SELECT count(*) FROM $tbl").as[Long].head() == 5L)
    // path form resolves too
    val hist2 = spark.sql(s"DESCRIBE HISTORY graftstore.`$root`").collect()
    assert(hist2.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("VACUUM RETAIN n HOURS maps to the age floor (fresh dirs survive)") {
    val (root, tbl) = seeded()
    spark.sql(s"DELETE FROM $tbl WHERE id = 1").collect()
    VersionedStore.expire(spark, root, keepLast = 1)
    // everything here was written seconds ago: a 1-hour floor reaps nothing
    spark.sql(s"VACUUM $tbl RETAIN 1 HOURS").collect()
    assert(spark.sql(s"SELECT count(*) FROM $tbl").as[Long].head() == 5L)
  }

  test("DESCRIBE DETAIL and SHOW TBLPROPERTIES answer from the " +
       "transaction log") {
    val (root, tbl) = seeded()
    spark.sql(s"DELETE FROM $tbl WHERE id = 6").collect() // v2 w/ commitTs
    val d = spark.sql(s"DESCRIBE DETAIL $tbl").collect()
    assert(d.length == 1)
    val row = d.head
    assert(row.getAs[String]("format") == "graftstore")
    assert(row.getAs[String]("location").stripPrefix("file:") == root)
    assert(row.getAs[Long]("version") == 2L)
    assert(row.getAs[java.sql.Timestamp]("committed_at") != null,
      "committed_at must surface the publish stamp")
    assert(row.getAs[Long]("num_data_dirs") >= 1L)
    assert(row.getAs[String]("schema").contains("id"))
    assert(row.getAs[String]("properties").contains("batch.w1=7"),
      s"properties must carry the commit meta: ${row.getAs[String]("properties")}")
    // the path form works too
    assert(spark.sql(s"DESCRIBE DETAIL graftstore.`$root`")
      .collect().head.getAs[Long]("version") == 2L)
    // SHOW TBLPROPERTIES: log meta + graft.version, not catalog options
    val props = spark.sql(s"SHOW TBLPROPERTIES $tbl").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.version").contains("2"))
    assert(props.get("batch.w1").contains("7"),
      s"the stream ledger must show as a table property: $props")
    assert(props.contains("commitTs"))
    // single-key form returns just the value
    val one = spark.sql(s"SHOW TBLPROPERTIES $tbl (graft.version)").collect()
    assert(one.length == 1 && one.head.getString(one.head.length - 1) == "2")
    // a non-graftstore table keeps Spark's own SHOW TBLPROPERTIES
    spark.sql("CREATE TABLE gsql_plainprops (id BIGINT) USING parquet " +
      "TBLPROPERTIES ('k'='v')")
    try {
      val p2 = spark.sql("SHOW TBLPROPERTIES gsql_plainprops").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(p2.get("k").contains("v") && !p2.contains("graft.version"))
    } finally spark.sql("DROP TABLE IF EXISTS gsql_plainprops")
  }

  test("DML on a time-traveled relation is rejected") {
    val (root, tbl) = seeded()
    spark.sql(s"DELETE FROM $tbl WHERE id = 6").collect()
    spark.sql(s"DROP TABLE IF EXISTS gsql_tt")
    spark.sql(s"CREATE TABLE gsql_tt USING graftstore " +
      s"OPTIONS (path '$root', versionAsOf '1')")
    val e = intercept[Exception] {
      spark.sql("DELETE FROM gsql_tt WHERE id = 1").collect()
    }
    assert(e.getMessage.contains("time-traveled"))
  }

  test("subquery conditions and non-graftstore targets are untouched/rejected") {
    val (root, tbl) = seeded()
    val e = intercept[Exception] {
      spark.sql(s"DELETE FROM $tbl WHERE id IN (SELECT id FROM $tbl WHERE v > 40)")
        .collect()
    }
    assert(e.getMessage.contains("subqueries"))
    // a plain parquet table still gets Spark's own v2-only error, not ours
    val other = Files.createTempDirectory("graft-sql-pq").toString
    Seq((1L, 2L)).toDF("a", "b").write.mode(SaveMode.Overwrite).parquet(other)
    spark.sql(s"DROP TABLE IF EXISTS gsql_pq")
    spark.sql(s"CREATE TABLE gsql_pq USING parquet OPTIONS (path '$other')")
    val e2 = intercept[Exception] {
      spark.sql("DELETE FROM gsql_pq WHERE a = 1").collect()
    }
    assert(!e2.getMessage.contains("graftstore"))
  }

  test("INSERT INTO is a transactional append (never a rogue file write): " +
       "version bumps, ledger carries, recorded stats reproduced") {
    val (root, tbl) = seeded()
    val v0 = VersionedStore.currentVersion(spark, root)
    val out = spark.sql(
      s"INSERT INTO $tbl VALUES (7, 70, 'g1'), (8, 80, 'g0')").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(v0 + 1))
    assert(spark.sql(s"SELECT count(*) FROM $tbl").as[Long].head() == 8L)
    assert(spark.sql(s"SELECT v FROM $tbl WHERE id = 8").as[Long].head() == 80L)
    // the commit path, not a file dump: ledger carried, and the new dir
    // reproduces the table's recorded stats columns (id), so a point
    // read still prunes instead of keeping a stats-less dir forever
    assert(VersionedStore.currentMeta(spark, root).get("batch.w1").contains("7"))
    val opened = VersionedStore.prunedDirs(spark, root, v0 + 1,
      Seq(VersionedStore.ColRange.eq("id", "7")))
    assert(opened.size == 1,
      s"id stats must be reproduced on the inserted dir: opened ${opened.size} dirs")
    // no loose files in the root: everything lives in data dirs/manifests
    val loose = new java.io.File(root).listFiles().filter(_.isFile)
      .map(_.getName)
      .filterNot(n => n.startsWith("_current") || n.startsWith("."))
    assert(loose.isEmpty, s"INSERT must not write loose files: ${loose.toSeq}")
  }

  test("INSERT OVERWRITE snapshots; the old version still time-travels") {
    val (root, tbl) = seeded()
    spark.sql(s"INSERT OVERWRITE $tbl VALUES (100, 1, 'z')").collect()
    assert(spark.sql(s"SELECT id FROM $tbl").as[Long].collect().toSeq == Seq(100L))
    assert(VersionedStore.readAt(spark, root, 1L).count() == 6L)
  }

  test("INSERT INTO a renamed (column-mapped) table goes through the marker path") {
    val (root, tbl) = seeded()
    VersionedStore.renameColumn(spark, root, "v", "score")
    spark.catalog.refreshTable(tbl)
    spark.sql(s"INSERT INTO $tbl VALUES (9, 90, 'g1')").collect()
    assert(spark.sql(s"SELECT score FROM $tbl WHERE id = 9").as[Long].head() == 90L)
    // BY NAME edition too
    spark.sql(s"INSERT INTO $tbl BY NAME " +
      "SELECT 'gX' AS grp, 11L AS id, 110L AS score").collect()
    assert(spark.sql(s"SELECT score FROM $tbl WHERE id = 11").as[Long].head() == 110L)
    // physical layout: the inserted dirs carry the BIRTH physical name
    val dirs = VersionedStore.prunedDirs(spark, root,
      VersionedStore.currentVersion(spark, root), Seq.empty)
    dirs.foreach { d =>
      val phys = spark.read.parquet(s"$root/$d").schema.fieldNames.toSet
      assert(phys.contains("v") && !phys.contains("score"))
    }
  }

  test("INSERT guards: PARTITION spec and partial column lists are rejected") {
    val (root, tbl) = seeded()
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $tbl PARTITION (grp='g1') VALUES (7, 70)").collect()
    }
    assert(e.getMessage.contains("PARTITION") || e.getMessage.contains("partition"))
  }

  test("CTAS: CREATE TABLE ... USING graftstore AS SELECT commits transactionally") {
    val root = Files.createTempDirectory("graft-sql-ctas").toString
    spark.sql("DROP TABLE IF EXISTS gsql_ctas")
    spark.sql(s"CREATE TABLE gsql_ctas USING graftstore OPTIONS (path '$root') " +
      "AS SELECT id, id * 2 AS dbl FROM range(5)")
    try {
      assert(spark.sql("SELECT sum(dbl) FROM gsql_ctas").as[Long].head() == 20L)
      assert(VersionedStore.currentVersion(spark, root) == 1L)
    } finally spark.sql("DROP TABLE IF EXISTS gsql_ctas")
  }

  test("ALTER TABLE RENAME COLUMN / DROP COLUMN: metadata-only commits, " +
       "reads follow, non-graftstore tables keep Spark's own error") {
    val (root, tbl) = seeded()
    val dirs0 = VersionedStore.prunedDirs(spark, root, 1L, Seq.empty).toSet
    spark.sql(s"ALTER TABLE $tbl RENAME COLUMN v TO score").collect()
    assert(spark.sql(s"SELECT score FROM $tbl WHERE id = 2").as[Long].head() == 20L)
    spark.sql(s"ALTER TABLE $tbl DROP COLUMN grp").collect()
    assert(spark.sql(s"SELECT * FROM $tbl WHERE id = 2").columns.toSeq ==
      Seq("id", "score"))
    // both were metadata-only: the data dirs never moved
    val v = VersionedStore.currentVersion(spark, root)
    assert(v == 3L)
    assert(VersionedStore.prunedDirs(spark, root, v, Seq.empty).toSet == dirs0)
    // DROP COLUMN IF EXISTS on a gone column is a no-op, not an error
    spark.sql(s"ALTER TABLE $tbl DROP COLUMN IF EXISTS grp").collect()
    assert(VersionedStore.currentVersion(spark, root) == 3L)
    // fully-qualified session-catalog form resolves too
    spark.sql(s"ALTER TABLE spark_catalog.default.$tbl RENAME COLUMN score TO s2")
      .collect()
    assert(spark.sql(s"SELECT s2 FROM $tbl WHERE id = 2").as[Long].head() == 20L)
    // a parquet table still gets Spark's own v2-only rejection
    val other = Files.createTempDirectory("graft-sql-alter-pq").toString
    Seq((1L, 2L)).toDF("a", "b").write.mode(SaveMode.Overwrite).parquet(other)
    spark.sql("DROP TABLE IF EXISTS gsql_alter_pq")
    spark.sql(s"CREATE TABLE gsql_alter_pq USING parquet OPTIONS (path '$other')")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gsql_alter_pq RENAME COLUMN a TO z").collect()
    }
    assert(!e.getMessage.contains("graftstore"))
  }

  test("SELECT ... VERSION AS OF reads the pinned snapshot; RESTORE undoes " +
       "a DELETE manifest-only") {
    val (root, tbl) = seeded()
    spark.sql(s"DELETE FROM $tbl WHERE id >= 4").collect()
    assert(spark.sql(s"SELECT count(*) FROM $tbl").as[Long].head() == 3L)
    // time travel through plain SQL — the pre-delete snapshot
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 1")
      .as[Long].head() == 6L)
    // joins across versions work too (the audit query shape)
    val gone = spark.sql(
      s"""SELECT old.id FROM $tbl VERSION AS OF 1 old
         |LEFT ANTI JOIN $tbl cur ON old.id = cur.id
         |ORDER BY old.id""".stripMargin).as[Long].collect().toSeq
    assert(gone == Seq(4L, 5L, 6L))
    // RESTORE: manifest-only undo, the bad version stays travelable
    val out = spark.sql(s"RESTORE TABLE $tbl TO VERSION AS OF 1").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(3L))
    assert(spark.sql(s"SELECT count(*) FROM $tbl").as[Long].head() == 6L)
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 2")
      .as[Long].head() == 3L)
    // TIMESTAMP AS OF resolves through the publish-stamped commit clock:
    // the stamp of version 2 (the post-DELETE state) pins that snapshot
    val ts2 = VersionedStore.metaAt(spark, root, 2L)("commitTs").toLong
    val inst = java.time.Instant.ofEpochMilli(ts2).toString
    assert(spark.sql(s"SELECT count(*) FROM $tbl TIMESTAMP AS OF '$inst'")
      .as[Long].head() == 3L)
    // a pre-first-commit timestamp is loud, never the wrong snapshot
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $tbl TIMESTAMP AS OF '1999-01-01'").collect()
    }
    assert(e.getMessage.contains("precedes the first stamped commit"))
    // DML on a timestamp-pinned relation is rejected like any travel
    val e2 = intercept[Exception] {
      spark.sql(s"DELETE FROM $tbl TIMESTAMP AS OF '$inst' WHERE id = 1")
        .collect()
    }
    assert(e2.getMessage.toLowerCase.contains("time-travel")
      || e2.getMessage.contains("TIMESTAMP AS OF")
      || e2.getMessage.toLowerCase.contains("syntax"),
      s"unexpected error shape: ${e2.getMessage}")
    // RESTORE by timestamp: resolve through the same commit clock
    // (the table currently reads 6 rows after the RESTORE above; v2's
    // stamp names the 3-row post-DELETE state)
    spark.sql(s"RESTORE TABLE $tbl TO TIMESTAMP AS OF '$inst'").collect()
    assert(spark.sql(s"SELECT count(*) FROM $tbl").as[Long].head() == 3L,
      "restore-to-timestamp must land on the stamped version's snapshot")
  }

  test("table_changes TVF: inclusive version bounds, DML labels, rename " +
       "in range reports current names, empty range = empty frame, guards") {
    val (root, tbl) = seeded()  // v1: ids 1..6
    spark.sql(s"DELETE FROM $tbl WHERE id >= 5").collect()          // v2
    spark.sql(s"ALTER TABLE $tbl RENAME COLUMN v TO score").collect() // v3
    spark.sql(s"UPDATE $tbl SET score = score + 1 WHERE id = 1").collect() // v4
    // full feed from the first commit; bounds are INCLUSIVE commit
    // versions (Delta's contract)
    val full = spark.sql(s"SELECT * FROM table_changes('$tbl', 1)")
    assert(full.columns.takeRight(2).toSeq ===
      Seq("_change_type", "_commit_version"))
    assert(full.columns.contains("score") && !full.columns.contains("v"),
      "a rename inside the range must report CURRENT names")
    val byType = full.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("insert" -> 6L, "delete" -> 2L,
      "update_preimage" -> 1L, "update_postimage" -> 1L), s"got $byType")
    // a single-version slice; path form resolves too
    val v2only = spark.sql(
      s"SELECT id FROM table_changes('graftstore.`$root`', 2, 2) ORDER BY id")
      .as[Long].collect().toSeq
    assert(v2only == Seq(5L, 6L), "version-2 slice = the DELETE's rows")
    // empty range (start = current + 1): zero rows, same schema
    val empty = spark.sql(s"SELECT * FROM table_changes('$tbl', 5)")
    assert(empty.count() === 0L &&
      empty.columns.contains("_change_type"))
    // timestamp bounds resolve through the commit clock: a start stamp
    // = v2's wall-clock selects commits AT OR AFTER v2; the same stamp
    // as the END bound floors to v2 (inclusive both ways, Delta's form)
    val ts2 = java.time.Instant.ofEpochMilli(
      VersionedStore.metaAt(spark, root, 2L)("commitTs").toLong).toString
    assert(spark.sql(
      s"SELECT count(*) FROM table_changes('$tbl', '$ts2')")
      .as[Long].head() === 4L, "v2..v4: 2 deletes + 1 update pair")
    assert(spark.sql(
      s"SELECT count(*) FROM table_changes('$tbl', 1, '$ts2')")
      .as[Long].head() === 8L, "v1..v2: 6 inserts + 2 deletes")
    // guards: version 0, a past-current NUMERIC end, garbage strings
    val e0 = intercept[Exception] {
      spark.sql(s"SELECT * FROM table_changes('$tbl', 0)").collect()
    }
    assert(e0.getMessage.contains("startVersion must be >= 1"))
    val eEnd = intercept[Exception] {
      spark.sql(s"SELECT * FROM table_changes('$tbl', 1, 99)").collect()
    }
    assert(eEnd.getMessage.contains("does not exist"))
    val eTs = intercept[Exception] {
      spark.sql(s"SELECT * FROM table_changes('$tbl', 'not-a-ts')").collect()
    }
    assert(eTs.getMessage.contains("cannot parse timestamp"))
  }

  test("zombie writer cannot double-commit through the fast CAS retry: " +
       "a ledger key advanced by someone else propagates the conflict") {
    val (root, _) = seeded()   // v1, ledger batch.w1=7
    // writer A (pinned at v1) commits its batch 8
    VersionedStore.commitAppendAt(
      Seq((50L, 500L, "gA")).toDF("id", "v", "grp"), root, 1L,
      meta = Map("batch.w1" -> "8"))
    // zombie instance of the SAME writer, same pinned base, same batch:
    // re-anchoring would append the rows twice — must conflict instead
    intercept[VersionedStore.CommitConflict] {
      VersionedStore.commitAppendAt(
        Seq((50L, 500L, "gA")).toDF("id", "v", "grp"), root, 1L,
        meta = Map("batch.w1" -> "8"))
    }
    assert(VersionedStore.currentVersion(spark, root) == 2L)
    // a DIFFERENT writer pinned at the same stale base fast-retries fine
    // (its own ledger key is untouched at the new base)
    VersionedStore.commitAppendAt(
      Seq((60L, 600L, "gB")).toDF("id", "v", "grp"), root, 1L,
      meta = Map("batch.w2" -> "3"))
    val m = VersionedStore.currentMeta(spark, root)
    assert(m.get("batch.w1").contains("8") && m.get("batch.w2").contains("3"),
      s"both watermarks must survive the re-anchor: $m")
    assert(VersionedStore.currentVersion(spark, root) == 3L)
  }

  test("CTE-prefixed MERGE matches the rule (not just root-level commands)") {
    val (root, tbl) = seeded()
    val out = spark.sql(
      s"""WITH src AS (SELECT 2L AS id, 222L AS v, 'gZ' AS grp)
         |MERGE INTO $tbl t USING src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L))
    assert(spark.sql(s"SELECT v FROM $tbl WHERE id = 2").as[Long].head() == 222L)
  }

  test("INSERT after renaming the STATS column: the request translates " +
       "to the current name and the new dir still prunes") {
    val (root, tbl) = seeded()   // statsCols = id
    spark.sql(s"ALTER TABLE $tbl RENAME COLUMN id TO ident").collect()
    spark.sql(s"INSERT INTO $tbl VALUES (70, 700, 'g1')").collect()
    assert(spark.sql(s"SELECT v FROM $tbl WHERE ident = 70").as[Long].head() == 700L)
    // the inserted dir recorded stats under the CURRENT logical name —
    // a point plan on ident prunes to it (pre-rename dirs keep their
    // old-name keys and are pruned through the dual-name expansion)
    val opened = VersionedStore.prunedDirs(spark, root,
      VersionedStore.currentVersion(spark, root),
      Seq(VersionedStore.ColRange.eq("ident", "70"),
        VersionedStore.ColRange.eq("id", "70")))
    assert(opened.size == 1, s"stats must key the current name: $opened")
  }

  test("maintenance verbs only match their grammar — everything else delegates") {
    // real Spark SQL still parses (the delegate path)
    assert(spark.sql("SELECT 1 + 1").as[Int].head() == 2)
    // a malformed OPTIMIZE falls through to Spark's parser error
    intercept[Exception] { spark.sql("OPTIMIZE") }
    intercept[Exception] { spark.sql("VACUUM") }
  }
}
