package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic raw Jira-shaped work items derived from the `events`
  * testdata table, so the E1 pipeline (T1 changelog explode → T4 event
  * dates → T8/T9 snapshots → T10 states) can be oracle-checked end to end:
  * DuckDB reproduces the same construction from `events` in pure SQL.
  *
  * Mapping (FIXTURES.md §1 shape, `revision_processor.ts:85-120`):
  *  - one work item per `user_id`, key `ITEM-<user_id>`;
  *  - `signup/view/click/purchase` events are status changes (status id =
  *    status name = event type); the change's `from` is the previous status
  *    event's type (first one: `signup`); `signup` histories additionally
  *    carry an assignee item (`user-<event_id mod 7>`);
  *  - `error` events alternate Flagged set / unset per user (odd/even
  *    occurrence), exercising the flag-removal marker (`:358-380`) and the
  *    T9 interval fill;
  *  - `fields.created` = min(ts) − 1 hour, `fields.updated` = max(ts);
  *    current status = last status event's type (default `signup`);
  *  - parent resolution fodder (T10, `revision_processor.ts:884-898`):
  *    `parent.key` when user_id % 3 = 0, parent-link custom field
  *    (`customfield_15503`) when % 3 = 1, epic-link (`customfield_10014`)
  *    when user_id % 2 = 0;
  *  - `customfield_10021` = [{value: 'Impediment'}] while the item is
  *    currently flagged (odd number of error events) — the
  *    `isItemFlagged` all-fields scan target (`:1038-1053`).
  *
  * The frame is serialized to JSON strings and parsed back through
  * [[RawItems]]-style `from_json`, so the declared queries exercise the S11
  * ingestion boundary, not just in-memory structs.
  */
object RawItemsFixture {

  val StatusTypes: Seq[String] = Seq("signup", "view", "click", "purchase")

  private val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

  /** Schema of the parsed raw item (the `from_json` contract). */
  val schema: StructType = {
    val changeItem = StructType(Seq(
      StructField("field", StringType),
      StructField("fieldId", StringType),
      StructField("from", StringType),
      StructField("fromString", StringType),
      StructField("to", StringType),
      StructField("toString", StringType)))
    val history = StructType(Seq(
      StructField("id", StringType),
      StructField("created", StringType),
      StructField("items", ArrayType(changeItem))))
    val flagEntry = StructType(Seq(StructField("value", StringType)))
    val issueKey = StructType(Seq(StructField("key", StringType)))
    val link = StructType(Seq(
      StructField("type", StructType(Seq(
        StructField("inward", StringType), StructField("outward", StringType)))),
      StructField("outwardIssue", issueKey),
      StructField("inwardIssue", issueKey)))
    val fields = StructType(Seq(
      StructField("issuelinks", ArrayType(link)),
      StructField("created", StringType),
      StructField("updated", StringType),
      StructField("summary", StringType),
      StructField("status", StructType(Seq(
        StructField("id", StringType), StructField("name", StringType)))),
      StructField("issuetype", StructType(Seq(StructField("name", StringType)))),
      StructField("project", StructType(Seq(StructField("id", StringType)))),
      StructField("assignee", StructType(Seq(StructField("displayName", StringType)))),
      StructField("parent", StructType(Seq(StructField("key", StringType)))),
      StructField("customfield_10014", StringType),
      StructField("customfield_15503", StringType),
      StructField("customfield_10021", ArrayType(flagEntry))))
    StructType(Seq(
      StructField("key", StringType),
      StructField("fields", fields),
      StructField("changelog", StructType(Seq(
        StructField("histories", ArrayType(history)))))))
  }

  /** Raw items as one JSON document per work item. */
  def asJson(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))

    val statusEv = events.filter(col("event_type").isin(StatusTypes: _*))
      .withColumn("prev", coalesce(lag(col("event_type"), 1).over(byUser), lit("signup")))
    val statusItem = struct(
      lit("status").as("field"), lit("status").as("fieldId"),
      col("prev").as("from"), col("prev").as("fromString"),
      col("event_type").as("to"), col("event_type").as("toString"))
    val assigneeItem = struct(
      lit("assignee").as("field"), lit("assignee").as("fieldId"),
      lit("").as("from"), lit("").as("fromString"),
      concat(lit("u"), pmod(col("event_id"), lit(7))).as("to"),
      concat(lit("user-"), pmod(col("event_id"), lit(7))).as("toString"))
    val statusHists = statusEv.select(col("user_id"),
      struct(
        (col("event_id") + 1).cast("string").as("id"),
        date_format(col("ts"), TsFmt).as("created"),
        when(col("event_type") === "signup", array(statusItem, assigneeItem))
          .otherwise(array(statusItem)).as("items")).as("h"))

    val errorEv = events.filter(col("event_type") === "error")
      .withColumn("ern", row_number().over(byUser))
    val flagSet = struct(
      lit("Flagged").as("field"), lit("customfield_10021").as("fieldId"),
      lit("").as("from"), lit("").as("fromString"),
      lit("flag").as("to"), lit("Impediment").as("toString"))
    val flagClear = struct(
      lit("Flagged").as("field"), lit("customfield_10021").as("fieldId"),
      lit("flag").as("from"), lit("Impediment").as("fromString"),
      lit("").as("to"), lit("").as("toString"))
    val errorHists = errorEv.select(col("user_id"),
      struct(
        (col("event_id") + 1).cast("string").as("id"),
        date_format(col("ts"), TsFmt).as("created"),
        when(pmod(col("ern"), lit(2)) === 1, array(flagSet))
          .otherwise(array(flagClear)).as("items")).as("h"))

    val lastStatus = statusEv
      .groupBy(col("user_id"))
      .agg(max_by(col("event_type"), struct(col("ts"), col("event_id"))).as("cur_status"))
    val lastAssignee = statusEv.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(max_by(pmod(col("event_id"), lit(7)), struct(col("ts"), col("event_id"))).as("cur_u"))
    val nErrors = errorEv.groupBy(col("user_id")).agg(count(lit(1)).as("n_err"))

    val base = events.groupBy(col("user_id")).agg(
      min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
      .join(lastStatus, Seq("user_id"), "left")
      .join(lastAssignee, Seq("user_id"), "left")
      .join(nErrors, Seq("user_id"), "left")

    val hists = statusHists.unionByName(errorHists)
      .groupBy(col("user_id")).agg(collect_list(col("h")).as("histories"))

    val uid = col("user_id")

    // T12 fodder: issuelinks — two links (outward + inward) for uid%4=0,
    // one inward link for uid%4=1, none otherwise.
    val linkType = (in: String, out: String) =>
      struct(lit(in).as("inward"), lit(out).as("outward"))
    val outLink = struct(
      linkType("is blocked by", "blocks").as("type"),
      struct(concat(lit("ITEM-"), pmod(uid, lit(9))).as("key")).as("outwardIssue"),
      lit(null).cast("struct<key:string>").as("inwardIssue"))
    val inLink = struct(
      linkType("clones", "is cloned by").as("type"),
      lit(null).cast("struct<key:string>").as("outwardIssue"),
      struct(concat(lit("ITEM-"), pmod(uid, lit(5))).as("key")).as("inwardIssue"))
    val issuelinks = when(pmod(uid, lit(4)) === 0, array(outLink, inLink))
      .when(pmod(uid, lit(4)) === 1, array(inLink))

    // T11 fodder: a genuinely polymorphic custom-field value, spliced into
    // the JSON as a raw snippet (a typed struct column cannot hold mixed
    // shapes): object-with-value / object-with-name / scalar string /
    // JSON null / array of strings, by uid%5.
    val polySnippet = when(pmod(uid, lit(5)) === 0, "{\"value\":\"Expedite\"}")
      .when(pmod(uid, lit(5)) === 1, "{\"name\":\"Standard\"}")
      .when(pmod(uid, lit(5)) === 2, "\"plain\"")
      .when(pmod(uid, lit(5)) === 3, "null")
      .otherwise("[\"a\",\"b\"]")

    base.join(hists, Seq("user_id"), "left")
      .select(replace(to_json(struct(
        concat(lit("ITEM-"), uid).as("key"),
        struct(
          issuelinks.as("issuelinks"),
          lit("__POLY__").as("customfield_10029"),
          date_format(col("min_ts") - expr("INTERVAL 1 HOUR"), TsFmt).as("created"),
          date_format(col("max_ts"), TsFmt).as("updated"),
          concat(lit("Item "), uid).as("summary"),
          struct(
            coalesce(col("cur_status"), lit("signup")).as("id"),
            coalesce(col("cur_status"), lit("signup")).as("name")).as("status"),
          struct(
            when(pmod(uid, lit(3)) === 0, "Story")
              .when(pmod(uid, lit(3)) === 1, "Bug")
              .otherwise("Task").as("name")).as("issuetype"),
          struct(concat(lit("100"), pmod(uid, lit(2))).as("id")).as("project"),
          when(col("cur_u").isNotNull,
            struct(concat(lit("user-"), col("cur_u")).as("displayName"))).as("assignee"),
          when(pmod(uid, lit(3)) === 0,
            struct(concat(lit("ITEM-"), pmod(uid, lit(7))).as("key"))).as("parent"),
          when(pmod(uid, lit(2)) === 0,
            concat(lit("EPIC-"), pmod(uid, lit(11)))).as("customfield_10014"),
          when(pmod(uid, lit(3)) === 1,
            concat(lit("PL-"), pmod(uid, lit(13)))).as("customfield_15503"),
          when(coalesce(pmod(col("n_err"), lit(2)), lit(0)) === 1,
            array(struct(lit("Impediment").as("value")))).as("customfield_10021")
        ).as("fields"),
        struct(col("histories")).as("changelog"))),
        lit("\"__POLY__\""), polySnippet).as("raw_json"))
  }

  /** Parse the JSON documents back into the typed raw-item frame — the
    * same shape `spark.read.json` would produce over an S3 raw-item drop
    * (S11, `src/workitem/s3_client.ts:38-60`).
    */
  def parsed(events: DataFrame): DataFrame =
    asJson(events).select(from_json(col("raw_json"), schema).as("r")).select("r.*")
}
