package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SHREDDED VARIANT PATHS: `'shred'='$.path:type'` at CREATE
  * materializes `try_variant_get` extractions as hidden physical
  * parquet columns in every epoch file, so a `variant_get` predicate
  * on a declared path prunes FILES through the ordinary min/max-stats
  * and Bloom keep functions — the file-granularity counterpart of
  * parquet write-shredding while Spark's `PushVariantIntoScan` covers
  * only the V1 read path. The hidden columns must never surface in the
  * table's schema or results, must survive rewrites (compaction,
  * split), and must follow renames.
  */
class ShreddedVariantSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val wh = Files.createTempDirectory("gshred-wh").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.gshr",
      classOf[graft.sources.GraftCatalog].getName)
    .config("spark.sql.catalog.gshr.warehouse", wh)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Distinct data files the executed DSv2 scan actually planned —
    * what the manifest index handed to ParquetScan AFTER skipping.
    */
  private def plannedFiles(df: DataFrame): Int = {
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty, "expected a BatchScanExec in the plan")
    scans.head.inputPartitions.flatMap {
      case fp: FilePartition => fp.files.map(_.urlEncodedPath)
      case _ => Seq.empty
    }.distinct.size
  }

  /** Three trickle batches into an eqDeletes table — each lands as an
    * overlay epoch (write-only path, no bucket rewrite), so files stay
    * batch-disjoint on the shredded paths: batch k carries lang
    * `l<k>` and scores in [k*100, k*100+49].
    */
  private def seedTrickle(table: String): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gshr.ns")
    spark.sql(s"""CREATE TABLE $table (id BIGINT, cf VARIANT)
      TBLPROPERTIES ('keys'='id', 'buckets'='4', 'eqDeletes'='true',
        'shred'='$$.lang:string,$$.score:bigint')""")
    (0 until 3).foreach { k =>
      spark.sql(s"""INSERT INTO $table
        SELECT id + ${k * 1000}, PARSE_JSON(CONCAT(
          '{"lang": "l$k", "score": ', ${k * 100} + id % 50,
          ', "noise": "', id, '"}'))
        FROM range(50)""")
    }
  }

  test("a variant-path equality predicate prunes files through the " +
       "hidden shred column's stats and Bloom sidecar") {
    seedTrickle("gshr.ns.t1")
    val all = spark.sql("SELECT id FROM gshr.ns.t1")
    val filtered = spark.sql("""SELECT id FROM gshr.ns.t1
      WHERE variant_get(cf, '$.lang', 'string') = 'l1'""")
    val (na, nf) = (plannedFiles(all), plannedFiles(filtered))
    assert(na >= 9, s"expected >= 9 batch-disjoint files, planned $na")
    assert(nf * 2 <= na,
      s"variant-path predicate pruned nothing: $nf of $na files")
    // skipping is I/O-only: results equal the unpruned evaluation
    assert(filtered.count() == 50)
    assert(spark.sql("""SELECT COUNT(*) FROM gshr.ns.t1
      WHERE variant_get(cf, '$.lang', 'string') = 'zz'""")
      .collect().head.getLong(0) == 0L)
  }

  test("a variant-path range predicate prunes through min/max; a " +
       "mistyped extraction prunes nothing but stays correct") {
    seedTrickle("gshr.ns.t2")
    val all = plannedFiles(spark.sql("SELECT id FROM gshr.ns.t2"))
    val ranged = spark.sql("""SELECT id FROM gshr.ns.t2
      WHERE variant_get(cf, '$.score', 'bigint') >= 200""")
    assert(plannedFiles(ranged) * 2 <= all,
      "range predicate on the shredded path pruned nothing")
    assert(ranged.count() == 50)
    // target type 'int' != declared 'bigint': no rewrite, no pruning —
    // and exactly the same rows (the scan's exact filter always runs)
    val mistyped = spark.sql("""SELECT id FROM gshr.ns.t2
      WHERE variant_get(cf, '$.score', 'int') >= 200""")
    assert(plannedFiles(mistyped) == all)
    assert(mistyped.count() == 50)
    // an undeclared path never rewrites either
    val undeclared = spark.sql("""SELECT id FROM gshr.ns.t2
      WHERE variant_get(cf, '$.noise', 'string') = '7'""")
    assert(plannedFiles(undeclared) == all)
  }

  test("hidden columns never surface: schema, SELECT *, and the " +
       "declared properties round-trip") {
    seedTrickle("gshr.ns.t3")
    val cols = spark.table("gshr.ns.t3").columns.toSeq
    assert(cols == Seq("id", "cf"))
    assert(!spark.sql("SELECT * FROM gshr.ns.t3").columns
      .exists(_.startsWith("_gshred_")))
    val props = spark.sql("SHOW TBLPROPERTIES gshr.ns.t3")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("shred") == "cf.$.lang:string,cf.$.score:bigint")
  }

  test("compaction and RENAME COLUMN keep shredded reads correct; " +
       "rename remaps the declaration and the recorded stats") {
    seedTrickle("gshr.ns.t4")
    spark.sql("CALL gshr.system.compact(table => 'ns.t4')")
    assert(spark.sql("""SELECT COUNT(*) FROM gshr.ns.t4
      WHERE variant_get(cf, '$.lang', 'string') = 'l2'""")
      .collect().head.getLong(0) == 50L)
    spark.sql("ALTER TABLE gshr.ns.t4 RENAME COLUMN cf TO doc")
    val props = spark.sql("SHOW TBLPROPERTIES gshr.ns.t4")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("shred") == "doc.$.lang:string,doc.$.score:bigint")
    val renamed = spark.sql("""SELECT id FROM gshr.ns.t4
      WHERE variant_get(doc, '$.score', 'bigint') < 100""")
    assert(renamed.count() == 50)
    // fresh writes after the rename record stats under the NEW hidden
    // name and keep pruning (old files' remapped min/max still prune;
    // their sidecar blooms degrade to keep-all, sound)
    spark.sql("""INSERT INTO gshr.ns.t4 SELECT id + 9000,
      PARSE_JSON(CONCAT('{"lang": "l9", "score": ', 900 + id % 50, '}'))
      FROM range(50)""")
    val all = plannedFiles(spark.sql("SELECT id FROM gshr.ns.t4"))
    val f9 = plannedFiles(spark.sql("""SELECT id FROM gshr.ns.t4
      WHERE variant_get(doc, '$.score', 'bigint') >= 900"""))
    assert(f9 < all, "post-rename shredded pruning lost")
  }

  test("build_shred_index retrofits a declaration onto an existing " +
       "table: future epochs prune, pre-declaration files stay " +
       "unpruned but correct; re-run no-op, new entries MERGE " +
       "additively") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gshr.ns")
    spark.sql("""CREATE TABLE gshr.ns.retro (id BIGINT, cf VARIANT)
      TBLPROPERTIES ('keys'='id', 'buckets'='4', 'eqDeletes'='true')""")
    // two PRE-declaration batches
    (0 until 2).foreach { k =>
      spark.sql(s"""INSERT INTO gshr.ns.retro SELECT id + ${k * 1000},
        PARSE_JSON(CONCAT('{"lang": "p$k", "n": ', id, '}'))
        FROM range(40)""")
    }
    spark.sql("""CALL gshr.system.build_shred_index(table => 'ns.retro',
      shred => '$.lang:string')""")
    // three POST-declaration batches — these files carry the hidden
    // column and must prune
    (2 until 5).foreach { k =>
      spark.sql(s"""INSERT INTO gshr.ns.retro SELECT id + ${k * 1000},
        PARSE_JSON(CONCAT('{"lang": "p$k", "n": ', id, '}'))
        FROM range(40)""")
    }
    val all = plannedFiles(spark.sql("SELECT id FROM gshr.ns.retro"))
    val post = plannedFiles(spark.sql("""SELECT id FROM gshr.ns.retro
      WHERE variant_get(cf, '$.lang', 'string') = 'p3'"""))
    val pre = plannedFiles(spark.sql("""SELECT id FROM gshr.ns.retro
      WHERE variant_get(cf, '$.lang', 'string') = 'p0'"""))
    assert(post < all, s"post-declaration batch must prune: $post/$all")
    // pre-declaration files have no hidden stats: kept (sound), but
    // the POST-declaration files still prune out of the p0 probe
    assert(pre < all, s"p0 probe must still skip post-decl files: $pre")
    assert(spark.sql("""SELECT COUNT(*) FROM gshr.ns.retro
      WHERE variant_get(cf, '$.lang', 'string') = 'p0'""")
      .collect().head.getLong(0) == 40L)
    // idempotent re-run — including a CANONICALLY-equal respelling
    // (type DDL case must not matter: the spec compares parsed types)
    spark.sql("""CALL gshr.system.build_shred_index(table => 'ns.retro',
      shred => '$.lang:string')""")
    spark.sql("""CALL gshr.system.build_shred_index(table => 'ns.retro',
      shred => '$.lang:STRING')""")
    // ADDITIVE evolution: a NEW path merges into the declaration
    // without a rebuild — post-add epochs prune on it, pre-add files
    // stay unpruned-but-correct (stats-absent)
    spark.sql("""CALL gshr.system.build_shred_index(table => 'ns.retro',
      shred => '$.n:bigint')""")
    // post-add batches carry batch-disjoint n ranges so the added
    // path's min/max can discriminate between their files
    (5 until 7).foreach { k =>
      spark.sql(s"""INSERT INTO gshr.ns.retro SELECT id + ${k * 1000},
        PARSE_JSON(CONCAT('{"lang": "p$k", "n": ', id + ${k * 1000}, '}'))
        FROM range(40)""")
    }
    val all2 = plannedFiles(spark.sql("SELECT id FROM gshr.ns.retro"))
    val onN = plannedFiles(spark.sql("""SELECT id FROM gshr.ns.retro
      WHERE variant_get(cf, '$.n', 'bigint') >= 6000"""))
    assert(onN < all2,
      s"post-add epochs must prune on the added path: $onN/$all2")
    // exactly batch 6's rows match; unindexed old files are read
    // (kept, sound) but contribute nothing — no row lost, none invented
    assert(spark.sql("""SELECT COUNT(*) FROM gshr.ns.retro
      WHERE variant_get(cf, '$.n', 'bigint') >= 6000""")
      .collect().head.getLong(0) == 40L,
      "added-path pruning must keep results exact over unindexed files")
    // and the ORIGINAL path still prunes after the merge
    assert(plannedFiles(spark.sql("""SELECT id FROM gshr.ns.retro
      WHERE variant_get(cf, '$.lang', 'string') = 'p6'""")) < all2)
  }

  test("the V1 format(\"graft\") read prunes on shredded paths too " +
       "(clustered table, within-file value locality), and time " +
       "travel answers shred predicates from its pinned version") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gshr.ns")
    // PLAIN table (no eqDeletes — live eq-deletes route V1 reads
    // through the DV bridge): the format route plans a V1
    // HadoopFsRelation over GraftFileIndex — same keep functions.
    // clusterBy(id) + maxRecordsPerFile splits each bucket into
    // id-sorted files; tag = id/100 correlates, so per-file tag
    // min/max are near-disjoint and the shred probe can skip.
    spark.sql("""CREATE TABLE gshr.ns.v1t (id BIGINT, cf VARIANT)
      TBLPROPERTIES ('keys'='id', 'buckets'='4', 'clusterBy'='id',
        'shred'='$.tag:string')""")
    val before = spark.conf.getOption("spark.sql.files.maxRecordsPerFile")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "25")
    try {
      spark.sql("""INSERT INTO gshr.ns.v1t SELECT id,
        PARSE_JSON(CONCAT('{"tag": "t', CAST(id DIV 100 AS STRING),
          '"}')) FROM range(300)""")
    } finally {
      before.fold(spark.conf
        .unset("spark.sql.files.maxRecordsPerFile"))(v =>
        spark.conf.set("spark.sql.files.maxRecordsPerFile", v))
    }
    val v1 = spark.read.format("graft").load(s"$wh/ns/v1t")
    def v1Files(df: org.apache.spark.sql.DataFrame): Long = {
      val scans = df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      assert(scans.nonEmpty, "expected a V1 FileSourceScanExec")
      df.collect()
      scans.head.metrics("numFiles").value
    }
    val na = v1Files(v1.select("id"))
    assert(na >= 8, s"expected >= 2 files per bucket, got $na")
    val filt = v1.filter(
      expr("variant_get(cf, '$.tag', 'string') = 't2'")).select("id")
    assert(filt.count() == 100)
    val nf = v1Files(v1.filter(
      expr("variant_get(cf, '$.tag', 'string') = 't2'")).select("id"))
    assert(nf < na, s"V1 shred pruning: $nf of $na files")
    // time travel: a version pinned BEFORE a later t9 insert answers
    // the shred predicate from its own stats (no t9 rows, no error)
    val v0 = spark.sql("SELECT MAX(version) FROM gshr.ns.v1t.history")
      .collect().head.getLong(0)
    spark.sql("""INSERT INTO gshr.ns.v1t SELECT id + 1000,
      PARSE_JSON('{"tag": "t9"}') FROM range(20)""")
    assert(spark.sql(s"""SELECT COUNT(*) FROM gshr.ns.v1t
        VERSION AS OF $v0
        WHERE variant_get(cf, '$$.tag', 'string') = 't9'""")
      .collect().head.getLong(0) == 0L)
    assert(spark.sql("""SELECT COUNT(*) FROM gshr.ns.v1t
        WHERE variant_get(cf, '$.tag', 'string') = 't9'""")
      .collect().head.getLong(0) == 20L)
  }

  test("qualified entries shred TWO variant columns independently; " +
       "array-index paths shred and prune like object paths") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gshr.ns")
    spark.sql("""CREATE TABLE gshr.ns.multi (id BIGINT, a VARIANT,
      b VARIANT) TBLPROPERTIES ('keys'='id', 'buckets'='4',
        'eqDeletes'='true',
        'shred'='a.$.kind:string,b.$.tags[0]:string')""")
    (0 until 3).foreach { k =>
      spark.sql(s"""INSERT INTO gshr.ns.multi SELECT id + ${k * 1000},
        PARSE_JSON('{"kind": "k$k"}'),
        PARSE_JSON('{"tags": ["g$k", "x"]}')
        FROM range(40)""")
    }
    val all = plannedFiles(spark.sql("SELECT id FROM gshr.ns.multi"))
    val onA = plannedFiles(spark.sql("""SELECT id FROM gshr.ns.multi
      WHERE variant_get(a, '$.kind', 'string') = 'k1'"""))
    val onB = plannedFiles(spark.sql("""SELECT id FROM gshr.ns.multi
      WHERE variant_get(b, '$.tags[0]', 'string') = 'g2'"""))
    assert(onA < all, s"column-a shred must prune: $onA/$all")
    assert(onB < all, s"array-path shred must prune: $onB/$all")
    assert(spark.sql("""SELECT COUNT(*) FROM gshr.ns.multi
      WHERE variant_get(b, '$.tags[0]', 'string') = 'g2'""")
      .collect().head.getLong(0) == 40L)
    // the same path probed on the WRONG column never rewrites
    assert(plannedFiles(spark.sql("""SELECT id FROM gshr.ns.multi
      WHERE variant_get(a, '$.tags[0]', 'string') = 'g2'""")) == all)
  }

  test("create-time validation: unknown column, non-variant column, " +
       "non-canonicalizable type, ambiguous omitted column") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gshr.ns")
    def failsWith(ddl: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(ddl))
      assert(e.getMessage.contains(frag),
        s"expected '$frag' in: ${e.getMessage}")
    }
    failsWith("""CREATE TABLE gshr.ns.bad1 (id BIGINT, cf VARIANT)
      TBLPROPERTIES ('keys'='id', 'shred'='nope.$.x:string')""",
      "not in the declared schema")
    failsWith("""CREATE TABLE gshr.ns.bad2 (id BIGINT, cf VARIANT)
      TBLPROPERTIES ('keys'='id', 'shred'='id.$.x:string')""",
      "must be VARIANT")
    failsWith("""CREATE TABLE gshr.ns.bad3 (id BIGINT, cf VARIANT)
      TBLPROPERTIES ('keys'='id', 'shred'='$.x:array<int>')""",
      "cannot feed min/max stats")
    failsWith("""CREATE TABLE gshr.ns.bad4 (id BIGINT, a VARIANT,
      b VARIANT) TBLPROPERTIES ('keys'='id', 'shred'='$.x:string')""",
      "omits the column name")
    // TIMESTAMP (with local zone) is shred-ineligible: the string→
    // timestamp extraction is session-timezone-dependent, so recorded
    // stats could disagree with a reader in a different zone — the one
    // case where pruning would not be conservative. NTZ is fine.
    failsWith("""CREATE TABLE gshr.ns.bad5 (id BIGINT, cf VARIANT)
      TBLPROPERTIES ('keys'='id', 'shred'='$.ts:timestamp')""",
      "Use TIMESTAMP_NTZ")
    spark.sql("""CREATE TABLE gshr.ns.okntz (id BIGINT, cf VARIANT)
      TBLPROPERTIES ('keys'='id', 'shred'='$.ts:timestamp_ntz')""")
    // nothing half-created
    assert(spark.sql("SHOW TABLES IN gshr.ns").collect()
      .map(_.getString(1)).forall(!_.startsWith("bad")))
  }

  test("strict-form skipping is a session choice: default ON (both " +
       "forms prune); rewriteStrict=false withholds the strict form " +
       "for layout-independent deterministic errors, TRY still prunes") {
    seedTrickle("gshr.ns.ansi")
    val all = plannedFiles(spark.sql("SELECT id FROM gshr.ns.ansi"))
    assert(plannedFiles(spark.sql("""SELECT id FROM gshr.ns.ansi
      WHERE variant_get(cf, '$.lang', 'string') = 'l1'""")) < all,
      "default: strict form prunes")
    spark.conf.set("spark.graft.shred.rewriteStrict", "false")
    try {
      assert(plannedFiles(spark.sql("""SELECT id FROM gshr.ns.ansi
        WHERE variant_get(cf, '$.lang', 'string') = 'l1'""")) == all,
        "opt-out: strict form must NOT prune (deterministic errors)")
      assert(plannedFiles(spark.sql("""SELECT id FROM gshr.ns.ansi
        WHERE try_variant_get(cf, '$.lang', 'string') = 'l1'""")) < all,
        "opt-out: the TRY form still prunes")
      // row results identical regardless of the skipping decision
      assert(spark.sql("""SELECT COUNT(*) FROM gshr.ns.ansi
        WHERE variant_get(cf, '$.lang', 'string') = 'l1'""")
        .collect().head.getLong(0) == 50L)
    } finally spark.conf.unset("spark.graft.shred.rewriteStrict")
  }
}
