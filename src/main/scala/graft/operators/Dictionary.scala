package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** ClickHouse external-dictionary pattern — `dictGet` /
  * `dictGetOrDefault` (SURVEY §2, c14).
  *
  * ClickHouse dictionaries are RAM-resident lookup tables replicated
  * on every server and queried as scalar functions, not joins. The
  * Spark-native equivalent of that contract is a BOUNDED dimension
  * collected once into a literal `MapType` column: `element_at` on a
  * map literal is a codegen'd hash probe inside WholeStageCodegen, the
  * fact-table scan stays a pure map (no join, no shuffle, no broadcast
  * exchange — the "dictionary" rides the serialized plan itself), and
  * chained dictGets (nation → region) compose at build time on the
  * driver.
  *
  * The collects here are dimension-bounded (nation = 25 rows, region
  * = 5 — fixed by the schema, not the corpus), the same contract as
  * [[Ann]]'s constant-size codebook collects: metadata, not data. For
  * dims that DON'T fit that contract, use `broadcast()` joins — the
  * dictionary pattern is specifically ClickHouse's "small enough to
  * pin in RAM everywhere" case.
  */
object Dictionary {

  /** Long-keyed string dictionary as a literal map column. */
  def mapLit(pairs: Seq[(Long, String)]): Column =
    map(pairs.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  /** dictGetOrDefault: map-literal probe with a default. */
  def dictGet(dict: Column, key: Column, default: String): Column =
    coalesce(element_at(dict, key.cast("long")), lit(default))

  /** c14: customers enriched with nation + region names via chained
    * dictionary lookups, then the usual bounded aggregate. The plan is
    * scan → project(map probes) → partial agg → 25-group exchange:
    * ZERO joins (pinned in DictionarySpec) where the join formulation
    * would broadcast-exchange both dims into every query. */
  def c14Query(s: SparkSession, d: String): DataFrame = {
    val nat = Tables.nation(s, d)
      .select(col("n_nationkey").cast("long"), col("n_name"),
        col("n_regionkey").cast("long"))
      .collect()
    val reg = Tables.region(s, d)
      .select(col("r_regionkey").cast("long"), col("r_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val nationName = nat.toSeq.map(r => r.getLong(0) -> r.getString(1))
    // chained dictGet composed at build: nationkey → region NAME
    val nationRegion = nat.toSeq.map(r =>
      r.getLong(0) -> reg.getOrElse(r.getLong(2), "unknown"))
    Tables.customer(s, d)
      .select(
        dictGet(mapLit(nationName), col("c_nationkey"), "unknown")
          .as("nation_name"),
        dictGet(mapLit(nationRegion), col("c_nationkey"), "unknown")
          .as("region_name"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
      .groupBy(col("nation_name"), col("region_name"))
      .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("acctbal_cents"))
      .orderBy(col("nation_name"), col("region_name"))
  }

  // ---------------------------------------------------------------- c19

  /** Region nodes share the nation keyspace offset by this base —
    * ClickHouse hierarchical dictionaries are one id space with a
    * parent pointer per node. */
  val RegionNodeBase = 100L

  /** The dictIsIn probe targets: region ASIA's node, and one single
    * nation node (its subtree = exactly that nation's customers), so
    * the ancestor check is exercised at BOTH levels of the chain. */
  val TargetRegionKey = 2L
  val TargetNationKey = 7L

  /** c19: hierarchical dictionary functions — ClickHouse
    * `dictGetHierarchy(dict, key)` (the root-ward ancestor chain) and
    * `dictIsIn(dict, child, ancestor)` — over the nation→region
    * hierarchy (nations parent to region nodes, regions are roots).
    *
    * Same engine shape as c14: the hierarchy is dimension-bounded
    * (25 + 5 nodes), so the chains are UNFOLDED ON THE DRIVER and ride
    * the plan as one literal map<key, array<node>>; `dictGetHierarchy`
    * is a codegen'd map probe, `dictIsIn` is `array_contains` on the
    * probed chain — the fact scan stays a pure map, ZERO joins
    * (spec-pinned), where ClickHouse walks parent pointers in RAM.
    * Chain depth is bounded by the dictionary's declared hierarchy,
    * never the corpus. */
  def c19Query(s: SparkSession, d: String): DataFrame = {
    val nat = Tables.nation(s, d)
      .select(col("n_nationkey").cast("long"), col("n_name"),
        col("n_regionkey").cast("long")).collect()
    val reg = Tables.region(s, d)
      .select(col("r_regionkey").cast("long"), col("r_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // parent pointers: nation → region node; region nodes are roots
    val chains: Map[Long, Seq[Long]] = nat.map { r =>
      r.getLong(0) -> Seq(r.getLong(0), RegionNodeBase + r.getLong(2))
    }.toMap
    val nodeName: Map[Long, String] = reg.map { case (k, v) =>
      (RegionNodeBase + k) -> v }
    val chainLit = typedlit(chains)
    val nameLit = typedlit(nodeName)
    val chain = element_at(chainLit, col("c_nationkey").cast("long"))
    Tables.customer(s, d)
      .select(
        coalesce(element_at(nameLit, element_at(chain, -1)), lit("unknown"))
          .as("region_name"),
        // a key ABSENT from the dictionary probes a NULL chain and
        // array_contains(NULL, x) is NULL — dictIsIn is defined total
        // (an unknown node is in nobody's subtree), matching the
        // oracle's CASE ... ELSE 0
        coalesce(array_contains(chain, lit(RegionNodeBase + TargetRegionKey))
          .cast("long"), lit(0L)).as("in_target_region"),
        coalesce(array_contains(chain, lit(TargetNationKey)).cast("long"),
          lit(0L)).as("in_target_nation"))
      .groupBy(col("region_name"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("in_target_region")).as("n_in_region"),
        sum(col("in_target_nation")).as("n_in_nation"))
      .orderBy(col("region_name"))
  }

  val oracles: Map[String, String] = Map(
    "c19_dict_hierarchy" ->
      s"""SELECT coalesce(r_name, 'unknown') AS region_name,
         |  count(*) AS n_cust,
         |  sum(CASE WHEN n_regionkey = $TargetRegionKey THEN 1 ELSE 0 END)::BIGINT
         |    AS n_in_region,
         |  sum(CASE WHEN c_nationkey = $TargetNationKey THEN 1 ELSE 0 END)::BIGINT
         |    AS n_in_nation
         |FROM customer
         |LEFT JOIN nation ON c_nationkey = n_nationkey
         |LEFT JOIN region ON n_regionkey = r_regionkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "c14_dictget" ->
      """SELECT coalesce(n_name, 'unknown') AS nation_name,
        |  coalesce(r_name, 'unknown') AS region_name,
        |  count(*) AS n_cust,
        |  sum(CAST(round(c_acctbal * 100) AS BIGINT))::BIGINT AS acctbal_cents
        |FROM customer
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
