package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Secondary-domain transforms (SURVEY §2.2/§2.3 tail):
  *
  *  - T14 exclude-completed-before filter
  *    (`src/common/process_revision_utils.ts:8-21`);
  *  - T15 demo-data anonymization, seeded
  *    (`src/jiracloud/process/translate_demo_data.ts:1-82`);
  *  - T18 sprint transform (`extract_sprints_processor.ts:472-533`);
  *  - T20 version-control transform (`gitlab_extractor.ts:587-640`);
  *  - A11/A12 scheduler fan-outs (`data_extract_requestor.ts:21-53`,
  *    `notification_scheduler.ts:37-75`).
  */
object SecondaryTransforms {

  /** T14: drop items whose departure (end of day) precedes the
    * exclude-before date (end of day) — i.e. calendar-day comparison.
    */
  def excludeCompletedBefore(df: DataFrame, departure: Column,
                             excludeBefore: Column): DataFrame =
    df.filter(departure.isNull || excludeBefore.isNull ||
      departure.cast("date") >= excludeBefore.cast("date"))

  private val LoremWords = Vector("lorem", "ipsum", "dolor", "sit", "amet",
    "consectetur", "adipiscing", "elit", "sed", "do", "eiusmod", "tempor")
  private val DemoNames = Vector("Alex Doe", "Sam Roe", "Jes Poe", "Kim Moe")

  /** T15: deterministic (seeded) anonymization — title → lorem sentence
    * derived from the item id hash, assignee → pseudonym pool, org
    * rewrite. The reference's random lorem is made reproducible so demo
    * streams are oracle-comparable.
    *
    * @param hashOf non-negative deterministic hash of the id driving the
    *   pseudonym choice; defaults to `abs(xxhash64(id))` (fast, engine
    *   native). Pass an engine-portable hash when cross-engine
    *   reproducibility of the pseudonyms themselves matters.
    */
  def anonymizeDemo(df: DataFrame, id: Column, title: String, assignee: String,
                    orgCol: String, demoOrgId: String,
                    hashOf: Column => Column = c => abs(xxhash64(c))): DataFrame = {
    val h = hashOf(id)
    val lorem = concat_ws(" ",
      (0 until 5).map(i => element_at(
        typedLit(LoremWords), (pmod(h + i, lit(LoremWords.size)) + 1).cast("int"))): _*)
    df.withColumn(title, lorem)
      .withColumn(assignee,
        element_at(typedLit(DemoNames), (pmod(h, lit(DemoNames.size)) + 1).cast("int")))
      .withColumn(orgCol, lit(demoOrgId))
  }

  /** T18: flatten (context→boards) × (board→sprints) into sprint rows. */
  def sprints(contextBoards: DataFrame, boardSprints: DataFrame): DataFrame =
    contextBoards.join(boardSprints, "boardId")
      .select(col("contextId"), col("boardId"), col("sprintId"),
        col("sprintName"), col("startDate"), col("endDate"))

  /** T20: MR/commit/pipeline payloads → the four normalized VC tables.
    * Input: mrs with a nested `commits` array, pipelines flat.
    * Returns (mergeRequests, commits, mergeRequestCommits, pipelines).
    */
  def vcTables(mrs: DataFrame, pipelines: DataFrame)
    : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val mergeRequests = mrs.select(col("mrId"), col("projectId"), col("title"),
      col("state"), col("createdAt"), col("mergedAt"))
    val mrCommits = mrs.select(col("mrId"), explode(col("commits")).as("c"))
    val commits = mrCommits.select(col("c.sha").as("sha"),
      col("c.authoredDate").as("authoredDate"), col("c.authorName").as("authorName"))
      .distinct()
    val bridge = mrCommits.select(col("mrId"), col("c.sha").as("sha"))
    val pipes = pipelines.select(col("pipelineId"), col("projectId"),
      col("status"), col("startedAt"), col("finishedAt"))
    (mergeRequests, commits, bridge, pipes)
  }

  /** A11: extract-worklist fan-out — enabled datasources with a runType. */
  def extractWorklist(datasources: DataFrame): DataFrame =
    datasources.filter(col("enabled") && col("runType").isNotNull)
      .select(col("orgId"), col("datasourceId"), col("datasourceType"), col("runType"))

  /** A12: threshold-notification fan-out grouped by (org, obeyaRoom). */
  def notificationGroups(subscriptions: DataFrame): DataFrame =
    subscriptions.groupBy(col("orgId"), col("obeyaRoomId"))
      .agg(collect_list(col("subscriptionId")).as("subscriptionIds"))
}
