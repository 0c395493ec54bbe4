package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Translate

/** Ports the reference's T11/T12/T16 test coverage
  * (`translate_customfield.test.ts` 416 LoC, `translate_linked_items.test.ts`,
  * `field_mapper.test.ts` 242 LoC).
  */
class TranslateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val mapper = new ObjectMapper()
  private def values(json: String): Seq[String] =
    Translate.extractCustomField(mapper.readTree(json), "customfield_1", "CF", "string")
      .map(_.datasourceFieldValue)

  // translate_customfield.test.ts — one fixture per polymorphic branch
  test("T11: polymorphic shapes") {
    assert(values(""""abc"""") == Seq("abc"))
    assert(values("42") == Seq("42"))
    assert(values("true") == Seq("true"))
    assert(values("null") == Seq("null")) // null → literal 'null'
    assert(values("""{"name":"x"}""") == Seq("x"))
    assert(values("""{"value":"y"}""") == Seq("y"))
    assert(values("""{"displayName":"z"}""") == Seq("z"))
    assert(values("""{"key":"PROJ-9"}""") == Seq("PROJ-9"))
    assert(values("""["a","b"]""") == Seq("a", "b"))
    assert(values("""[{"name":"n1"},{"value":"v1"}]""") == Seq("n1", "v1"))
    // arbitrary object under a customfield* name → stringified
    assert(values("""{"foo":1}""") == Seq("""{"foo":1}"""))
    // arbitrary object under a non-customfield name → dropped
    assert(Translate.extractCustomField(
      mapper.readTree("""{"foo":1}"""), "other", "CF", "string").isEmpty)
  }

  test("T11: DataFrame explode shape") {
    import spark.implicits._
    val df = Seq(
      ("A", """{"customfield_1":{"value":"Expedite"},"customfield_2":["x","y"]}"""),
      ("B", """{"customfield_1":null}""")).toDF("id", "fields")
    val out = Translate.customFields(df, col("id"), col("fields"),
        Seq(("customfield_1", "CoS", "string"), ("customfield_2", "Tags", "string")))
      .collect()
      .map(r => (r.getAs[String]("workItemId"), r.getAs[String]("datasourceFieldName"),
        r.getAs[String]("datasourceFieldValue"))).toSet
    assert(out == Set(
      ("A", "customfield_1", "Expedite"),
      ("A", "customfield_2", "x"), ("A", "customfield_2", "y"),
      ("B", "customfield_1", "null")))
  }

  // translate_linked_items.test.ts
  test("T12: linked items outward/inward") {
    val df = spark.read.json(
      spark.createDataset(Seq(
        """{"id":"A","issuelinks":[
          |{"type":{"inward":"is blocked by","outward":"blocks"},"outwardIssue":{"key":"P-2"}},
          |{"type":{"inward":"relates","outward":"relates to"},"inwardIssue":{"key":"P-3"}},
          |{"type":{"inward":"x","outward":"y"}}]}""".stripMargin.replace("\n", "")))(
        org.apache.spark.sql.Encoders.STRING))
    val out = df.select(explode(Translate.linkedItems(col("issuelinks"))).as("l"))
      .select(col("l.type"), col("l.workItemId")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("blocks", "P-2"), ("relates", "P-3")))
  }

  // field_mapper.test.ts — conditional copy chain
  test("T16: conditional field copy") {
    import spark.implicits._
    val df = Seq(
      ("i1", "src1", "old1", "match", "yes"),
      ("i2", "src2", "old2", "match", "no"),
      ("i3", "src3", "old3", "nomatch", "yes"))
      .toDF("id", "src", "dest", "c1", "c2")
    val out = Translate.conditionalFieldCopy(df, "src", "dest",
        Seq(("c1", "match"), ("c2", "yes")))
      .collect().map(r => r.getAs[String]("id") -> r.getAs[String]("dest")).toMap
    // copies only when ALL conditions hold
    assert(out == Map("i1" -> "src1", "i2" -> "old2", "i3" -> "old3"))
    // empty conditions copy nothing
    val none = Translate.conditionalFieldCopy(df, "src", "dest", Seq.empty)
      .collect().map(r => r.getAs[String]("id") -> r.getAs[String]("dest")).toMap
    assert(none("i1") == "old1")
  }
}
