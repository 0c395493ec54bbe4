package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MergeWriter

/** SQL row-level DML on graft tables: MERGE INTO, UPDATE, and
  * general-predicate DELETE through the delta-based DSv2 contract
  * (SupportsRowLevelOperations + SupportsDelta). Verifies semantics,
  * single-commit atomicity (one manifest version per statement), and
  * that only changed keys travel (change-feed evidence).
  */
class GraftRowLevelSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val wh = Files.createTempDirectory("grl-wh").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.gc",
      classOf[graft.sources.GraftCatalog].getName)
    .config("spark.sql.catalog.gc.warehouse", wh)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def version(path: String): Long =
    MergeWriter.describeTable(spark, path).collect().head
      .getAs[Long]("version")

  test("MERGE INTO: update, conditional update, delete, insert — one commit") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gc.dml")
    spark.sql("DROP TABLE IF EXISTS gc.dml.t")
    spark.sql("CREATE TABLE gc.dml.t (id BIGINT, v DOUBLE, s STRING) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='4')")
    spark.sql("INSERT INTO gc.dml.t " +
      "SELECT id, CAST(id AS DOUBLE), concat('r', id) FROM range(100)")
    val path = s"$wh/dml/t"
    val v0 = version(path)

    spark.sql("""
      MERGE INTO gc.dml.t t
      USING (SELECT id, CAST(id * 10 AS DOUBLE) AS nv FROM range(95, 105)) s
      ON t.id = s.id
      WHEN MATCHED AND t.id = 97 THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.nv, s = concat('u', t.id)
      WHEN NOT MATCHED THEN INSERT (id, v, s) VALUES (s.id, s.nv, 'new')
    """)

    // exactly ONE commit covers updates + delete + inserts
    assert(version(path) == v0 + 1)
    val out = spark.sql(
      "SELECT id, v, s FROM gc.dml.t WHERE id >= 90 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(!out.exists(_._1 == 97), "WHEN MATCHED AND id=97 THEN DELETE")
    assert(out.filter(_._1 >= 100).map(_._1).toSeq ==
      Seq(100L, 101L, 102L, 103L, 104L))
    assert(out.find(_._1 == 96).get == ((96L, 960.0, "u96")))
    assert(out.find(_._1 == 101).get == ((101L, 1010.0, "new")))
    assert(out.find(_._1 == 94).get == ((94L, 94.0, "r94")),
      "unmatched target rows untouched")
    assert(spark.sql("SELECT COUNT(*) AS c FROM gc.dml.t")
      .collect().head.getLong(0) == 104) // 100 - 1 deleted + 5 inserted

    // only the changed keys travel between the two versions
    val feed = MergeWriter.changeFeed(spark, path, v0, v0 + 1,
      Seq("id"), Seq("v", "s")).collect()
    val changed = feed.map(_.getAs[Long]("id")).toSet
    assert(changed == (95L to 104L).toSet,
      s"change feed should hold exactly the merged keys, got $changed")
    spark.sql("DROP TABLE gc.dml.t")
  }

  test("MERGE INTO: WHEN NOT MATCHED BY SOURCE clauses") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gc.dml")
    spark.sql("DROP TABLE IF EXISTS gc.dml.nbs")
    spark.sql("CREATE TABLE gc.dml.nbs (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id')")
    spark.sql("INSERT INTO gc.dml.nbs SELECT id, id FROM range(10)")
    spark.sql("""
      MERGE INTO gc.dml.nbs t
      USING (SELECT id FROM range(4)) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = t.v + 100
      WHEN NOT MATCHED BY SOURCE AND t.id >= 8 THEN DELETE
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = -1
    """)
    val rows = spark.sql("SELECT id, v FROM gc.dml.nbs ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq(0L -> 100L, 1L -> 101L, 2L -> 102L, 3L -> 103L,
      4L -> -1L, 5L -> -1L, 6L -> -1L, 7L -> -1L))
    spark.sql("DROP TABLE gc.dml.nbs")
  }

  test("MERGE INTO: multiple source matches for one target row error out") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gc.dml")
    spark.sql("DROP TABLE IF EXISTS gc.dml.card")
    spark.sql("CREATE TABLE gc.dml.card (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id')")
    spark.sql("INSERT INTO gc.dml.card SELECT id, id FROM range(5)")
    val e = intercept[Exception] {
      spark.sql("""
        MERGE INTO gc.dml.card t
        USING (SELECT CAST(0 AS BIGINT) AS id, 1 AS n
               UNION ALL SELECT CAST(0 AS BIGINT), 2) s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v = s.n
      """)
    }
    assert(e.getMessage != null) // SQLSTATE 21506 / MERGE_CARDINALITY...
    spark.sql("DROP TABLE gc.dml.card")
  }

  test("MERGE INTO: duplicate-key INSERTs are rejected, not smuggled in") {
    // SQL's cardinality check guards only MATCHED rows — two NOT
    // MATCHED source rows with the same key must not plant a duplicate
    // in a keyed table
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gc.dml")
    spark.sql("DROP TABLE IF EXISTS gc.dml.dupins")
    spark.sql("CREATE TABLE gc.dml.dupins (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id')")
    spark.sql("INSERT INTO gc.dml.dupins SELECT id, id FROM range(5)")
    val e = intercept[Exception] {
      spark.sql("""
        MERGE INTO gc.dml.dupins t
        USING (SELECT CAST(100 AS BIGINT) AS id, 1 AS n
               UNION ALL SELECT CAST(100 AS BIGINT), 2) s
        ON t.id = s.id
        WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.n)
      """)
    }
    assert(e.getMessage != null)
    assert(spark.sql("SELECT COUNT(*) AS c FROM gc.dml.dupins")
      .collect().head.getLong(0) == 5, "failed merge must change nothing")
    spark.sql("DROP TABLE gc.dml.dupins")
  }

  test("UPDATE: expression assignments with WHERE, one commit") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gc.dml")
    spark.sql("DROP TABLE IF EXISTS gc.dml.u")
    spark.sql("CREATE TABLE gc.dml.u (id BIGINT, v DOUBLE, s STRING) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='4')")
    spark.sql("INSERT INTO gc.dml.u " +
      "SELECT id, CAST(id AS DOUBLE), concat('x', id % 3) FROM range(60)")
    val path = s"$wh/dml/u"
    val v0 = version(path)
    // an UPDATE no metadata path could express: correlated-ish exprs on
    // both sides of the assignment, predicate over two columns
    spark.sql("UPDATE gc.dml.u SET v = v * 2 + length(s), " +
      "s = upper(s) WHERE id % 5 = 0 AND length(s) = 2")
    assert(version(path) == v0 + 1)
    val r10 = spark.sql("SELECT v, s FROM gc.dml.u WHERE id = 10")
      .collect().head
    assert(r10.getDouble(0) == 22.0 && r10.getString(1) == "X1")
    val untouched = spark.sql("SELECT v, s FROM gc.dml.u WHERE id = 11")
      .collect().head
    assert(untouched.getDouble(0) == 11.0 && untouched.getString(1) == "x2")
    assert(spark.sql(
      "SELECT COUNT(*) AS c FROM gc.dml.u WHERE s = upper(s)")
      .collect().head.getLong(0) == 12)
    spark.sql("DROP TABLE gc.dml.u")
  }

  test("UPDATE that rewrites a KEY column: old identity dies, new lands") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gc.dml")
    spark.sql("DROP TABLE IF EXISTS gc.dml.k")
    spark.sql("CREATE TABLE gc.dml.k (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='4')")
    spark.sql("INSERT INTO gc.dml.k SELECT id, id FROM range(10)")
    spark.sql("UPDATE gc.dml.k SET id = id + 1000 WHERE id < 3")
    val ids = spark.sql("SELECT id FROM gc.dml.k ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(3L, 4L, 5L, 6L, 7L, 8L, 9L, 1000L, 1001L, 1002L))
    spark.sql("DROP TABLE gc.dml.k")
  }

  test("DELETE with an untranslatable predicate takes the row-level path") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gc.dml")
    spark.sql("DROP TABLE IF EXISTS gc.dml.d")
    spark.sql("CREATE TABLE gc.dml.d (id BIGINT, s STRING) " +
      "TBLPROPERTIES ('keys'='id')")
    spark.sql("INSERT INTO gc.dml.d SELECT id, concat('a', id) FROM range(10)")
    // length('a'||id) > 2 ⇔ id >= 10 is false... actually: 'a0'..'a9'
    // all length 2; repeat twice → length 4 > id for id in 0..3
    spark.sql("DELETE FROM gc.dml.d WHERE length(repeat(s, 2)) > id + 0.5")
    val left = spark.sql("SELECT id FROM gc.dml.d ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(left == Seq(4L, 5L, 6L, 7L, 8L, 9L))
    spark.sql("DROP TABLE gc.dml.d")
  }

  test("MERGE INTO with a graft table as SOURCE: table-to-table pipeline") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gc.dml")
    spark.sql("DROP TABLE IF EXISTS gc.dml.tgt")
    spark.sql("DROP TABLE IF EXISTS gc.dml.src")
    spark.sql("CREATE TABLE gc.dml.tgt (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id')")
    spark.sql("INSERT INTO gc.dml.tgt SELECT id, id FROM range(10)")
    spark.sql("CREATE TABLE gc.dml.src TBLPROPERTIES ('keys'='id') " +
      "AS SELECT id, id * 10 AS nv FROM range(5, 15)")
    // both sides read through the manifest-driven scan; the join keys
    // are each side's NOT NULL merge keys
    spark.sql("""
      MERGE INTO gc.dml.tgt t
      USING gc.dml.src s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.nv
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.nv)
    """)
    val out = spark.sql("SELECT id, v FROM gc.dml.tgt ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == ((0L to 4L).map(i => i -> i) ++
      (5L to 14L).map(i => i -> i * 10)))
    spark.sql("DROP TABLE gc.dml.tgt")
    spark.sql("DROP TABLE gc.dml.src")
  }

  test("UPDATE writes a column added by ALTER after creation") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gc.dml")
    spark.sql("DROP TABLE IF EXISTS gc.dml.ev")
    spark.sql("CREATE TABLE gc.dml.ev (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id')")
    spark.sql("INSERT INTO gc.dml.ev SELECT id, id FROM range(6)")
    spark.sql("ALTER TABLE gc.dml.ev ADD COLUMNS (score DOUBLE)")
    // the row-level scan/write schemas must carry the evolved column:
    // matched rows land with it set, unmatched keep their NULL fill
    spark.sql("UPDATE gc.dml.ev SET score = v * 0.5 WHERE id % 2 = 0")
    val rows = spark.sql("SELECT id, score FROM gc.dml.ev ORDER BY id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSeq
    assert(rows == Seq(0L -> Some(0.0), 1L -> None, 2L -> Some(1.0),
      3L -> None, 4L -> Some(2.0), 5L -> None))
    spark.sql("DROP TABLE gc.dml.ev")
  }

  test("a crashed statement's staging dir is vacuumed after retention") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gc.dml")
    spark.sql("DROP TABLE IF EXISTS gc.dml.z")
    spark.sql("CREATE TABLE gc.dml.z (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id')")
    spark.sql("INSERT INTO gc.dml.z SELECT id, id FROM range(5)")
    val path = s"$wh/dml/z"
    // a zombie staging dir from a driver that died mid-statement
    val zombie = new java.io.File(s"$path/_rowlevel-dead-query")
    assert(zombie.mkdirs())
    val f = new java.io.File(zombie, "d-0-1.up")
    assert(f.createNewFile())
    val old = System.currentTimeMillis() - 7L * 24 * 3600 * 1000
    f.setLastModified(old); zombie.setLastModified(old)
    MergeWriter.vacuum(spark, path, 3600 * 1000L)
    assert(!zombie.exists(), "aged staging dir should be swept")
    // a FRESH staging dir (in-flight statement) survives
    val live = new java.io.File(s"$path/_rowlevel-live-query")
    assert(live.mkdirs())
    MergeWriter.vacuum(spark, path, 3600 * 1000L)
    assert(live.exists(), "young staging dir must survive vacuum")
    assert(spark.sql("SELECT COUNT(*) AS c FROM gc.dml.z")
      .collect().head.getLong(0) == 5)
    spark.sql("DROP TABLE gc.dml.z")
  }

  test("row-level DML on a time-travel pin is rejected") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gc.dml")
    spark.sql("DROP TABLE IF EXISTS gc.dml.pin")
    spark.sql("CREATE TABLE gc.dml.pin (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id')")
    spark.sql("INSERT INTO gc.dml.pin SELECT id, id FROM range(5)")
    spark.sql("INSERT INTO gc.dml.pin VALUES (0, 99)")
    val v1 = version(s"$wh/dml/pin") - 1
    val e = intercept[Exception] {
      spark.sql(s"UPDATE gc.dml.pin VERSION AS OF $v1 SET v = 0")
    }
    assert(e.getMessage != null)
    spark.sql("DROP TABLE gc.dml.pin")
  }

  test("MERGE WITH SCHEMA EVOLUTION: source-only columns evolve the table") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gc.dml")
    spark.sql("DROP TABLE IF EXISTS gc.dml.ev")
    spark.sql("CREATE TABLE gc.dml.ev (id BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='2')")
    spark.sql("INSERT INTO gc.dml.ev " +
      "SELECT id, CAST(id AS DOUBLE) FROM range(10)")
    spark.sql("""
      MERGE WITH SCHEMA EVOLUTION INTO gc.dml.ev t
      USING (SELECT id, CAST(id * 2 AS DOUBLE) AS v,
                    concat('tag', id) AS tag
             FROM range(5, 15)) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
    """)
    val out = spark.sql(
      "SELECT id, v, tag FROM gc.dml.ev ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        Option(r.getString(2)).getOrElse("-")))
    assert(out.length == 15)
    // pre-existing unmatched rows null-fill the evolved column
    assert(out.find(_._1 == 2).get == ((2L, 2.0, "-")))
    // matched rows take the source's evolved value
    assert(out.find(_._1 == 7).get == ((7L, 14.0, "tag7")))
    // inserted rows carry it from birth
    assert(out.find(_._1 == 12).get == ((12L, 24.0, "tag12")))
    spark.sql("DROP TABLE gc.dml.ev")
  }

  test("a commit landing between scan and apply conflicts, not clobbers") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = s"$wh/conflict/t"
    // buckets = 1 so ANY concurrent commit contests the changeset's bucket
    MergeWriter.merge(spark, path,
      (0L until 50L).map(i => (i, i.toDouble)).toDF("id", "v"),
      Seq("id"), buckets = 1)
    val v0 = version(path)
    // a writer lands AFTER the statement's scan pinned v0
    MergeWriter.merge(spark, path, Seq((7L, 700.0)).toDF("id", "v"),
      Seq("id"))
    val up = Seq((7L, 7000.0)).toDF("id", "v")
    val noDeletes = Seq.empty[Long].toDF("id")
    // the apply derived from the v0 scan must raise the protocol's
    // conflict instead of silently overwriting the concurrent 700.0
    intercept[java.util.ConcurrentModificationException] {
      MergeWriter.applyChanges(spark, path, up, noDeletes, Seq("id"),
        expectedVersion = Some(v0))
    }
    intercept[java.util.ConcurrentModificationException] {
      MergeWriter.delete(spark, path, Seq(7L).toDF("id"), Seq("id"),
        expectedVersion = Some(v0))
    }
    assert(MergeWriter.readTable(spark, path).where(col("id") === 7)
      .collect().head.getDouble(1) == 700.0, "concurrent commit survives")
    // re-run against the current state proceeds
    MergeWriter.applyChanges(spark, path, up, noDeletes, Seq("id"),
      expectedVersion = Some(version(path)))
    assert(MergeWriter.readTable(spark, path).where(col("id") === 7)
      .collect().head.getDouble(1) == 7000.0)
  }

  test("row-level DML survives a warehouse path containing commas/spaces") {
    // staged changeset files are opened per-path through the FileSystem —
    // a comma in the table path must not split it into two bogus paths
    // (Hadoop input-path strings treat commas as separators)
    val weird = Files.createTempDirectory("grl wh,x").toString
    spark.conf.set("spark.sql.catalog.gweird",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gweird.warehouse", weird)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gweird.ns")
    spark.sql("CREATE TABLE gweird.ns.t (id BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='2')")
    spark.sql("INSERT INTO gweird.ns.t " +
      "SELECT id, CAST(id AS DOUBLE) FROM range(20)")
    spark.sql("UPDATE gweird.ns.t SET v = v * 100 WHERE id % 2 = 0")
    val out = spark.sql(
      "SELECT CAST(SUM(v) AS BIGINT) AS s FROM gweird.ns.t")
      .collect().head.getLong(0)
    // odds: 1+3+...+19 = 100; evens: (0+2+...+18)*100 = 9000
    assert(out == 9100L)
  }
}
