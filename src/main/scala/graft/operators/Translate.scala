package graft.operators

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Field-level translations of the raw work item:
  *
  *  - T11 polymorphic custom-field extraction
  *    (`src/jiracloud/process/translate_customfield.ts:3-116`);
  *  - T12 linked-items translation
  *    (`src/jiracloud/process/translate_linked_items.ts:3-42`);
  *  - T16 conditional field-map copy
  *    (`src/configuration/field_map/field_mapper.ts:1-101`).
  *
  * T11 is a UDF over the raw JSON value because the value shape is
  * genuinely dynamic (`[propName: string]: any`); it runs once per
  * (item, configured field) — config-path, not the hot path. T12/T16 are
  * pure Catalyst expressions.
  */
object Translate {

  case class CustomFieldValue(
      datasourceFieldName: String,
      displayName: String,
      datasourceFieldValue: String,
      fieldType: String)

  /** T11 kernel over a parsed JSON node; mirrors the reference's branch
    * order exactly: null → literal 'null'; array of string/{name}/{value}
    * /else-stringify; object with name ∥ value ∥ displayName ∥ key;
    * scalar → stringified; other objects only for `customfield*` names.
    */
  private[graft] def extractCustomField(
      node: JsonNode, fieldName: String, displayName: String,
      fieldType: String): Seq[CustomFieldValue] = {
    def mk(v: String) = CustomFieldValue(fieldName, displayName, v, fieldType)
    if (node == null) Seq.empty
    else if (node.isNull) Seq(mk("null"))
    else if (node.isArray) {
      import scala.jdk.CollectionConverters._
      node.elements().asScala.map { el =>
        if (el.isTextual) mk(el.asText())
        else if (el.has("name")) mk(el.get("name").asText())
        else if (el.has("value")) mk(el.get("value").asText())
        else mk(el.toString)
      }.toSeq
    }
    else if (node.isObject && node.has("name")) Seq(mk(node.get("name").asText()))
    else if (node.isObject && node.has("value")) Seq(mk(node.get("value").asText()))
    else if (node.isObject && node.has("displayName")) Seq(mk(node.get("displayName").asText()))
    else if (node.isObject && node.has("key")) Seq(mk(node.get("key").asText()))
    else if (node.isTextual) Seq(mk(node.asText()))
    else if (node.isNumber || node.isBoolean) Seq(mk(node.asText()))
    else if (fieldName.startsWith("customfield")) Seq(mk(node.toString))
    else Seq.empty
  }

  /** T11 over a DataFrame: `fieldsJson` is the raw `fields` object as a
    * JSON string; `configs` is the customFieldConfigs dimension
    * (fieldName → (displayName, type)). Output: one exploded row per
    * extracted (item, field, value) — the shape of the `customFields`
    * table (`sql/full_ddl.sql:249-262`).
    */
  def customFields(df: DataFrame, id: Column, fieldsJson: Column,
                   configs: Seq[(String, String, String)]): DataFrame = {
    val confs = configs
    val extract = udf { json: String =>
      if (json == null) Seq.empty[CustomFieldValue]
      else {
        val mapper = new ObjectMapper()
        val root = mapper.readTree(json)
        confs.flatMap { case (name, display, tpe) =>
          if (root.has(name)) extractCustomField(root.get(name), name, display, tpe)
          else Seq.empty
        }
      }
    }
    df.select(id.as("workItemId"), explode(extract(fieldsJson)).as("cf"))
      .select(col("workItemId"),
        col("cf.datasourceFieldName"), col("cf.displayName"),
        col("cf.datasourceFieldValue"), col("cf.fieldType").as("type"))
  }

  /** T12: `issuelinks[]` → `{type: outward∥inward name, workItemId}` rows,
    * as a higher-order `transform` + `filter` (links with neither side are
    * dropped, matching the reference's `continue`).
    */
  def linkedItems(issuelinks: Column): Column = {
    val mapped = transform(issuelinks, link =>
      struct(
        when(link.getField("outwardIssue").isNotNull,
          link.getField("type").getField("outward"))
          .otherwise(link.getField("type").getField("inward")).as("type"),
        coalesce(link.getField("outwardIssue").getField("key"),
          link.getField("inwardIssue").getField("key")).as("workItemId")))
    filter(mapped, l => l.getField("workItemId").isNotNull)
  }

  /** T16: copy `sourceCol` into `destCol` iff every
    * (conditionCol = expected) holds — the reference's
    * AllConditionsTrueFieldMapper with FieldContainsExactStringCondition
    * chain, as a single `when` expression generated from the fieldMaps
    * dimension. An empty condition list copies nothing (`:60`).
    */
  def conditionalFieldCopy(df: DataFrame, sourceCol: String, destCol: String,
                           conditions: Seq[(String, String)]): DataFrame =
    if (conditions.isEmpty) df
    else {
      val all = conditions.map { case (c, v) => col(c).isNotNull && col(c) === v }
        .reduce(_ && _)
      df.withColumn(destCol, when(all, col(sourceCol)).otherwise(col(destCol)))
    }
}
