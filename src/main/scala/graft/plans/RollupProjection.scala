package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

/** ClickHouse PROJECTION auto-selection as a Catalyst optimizer rule
  * (injected by [[graft.GraftExtensions]] via `injectOptimizerRule`):
  * an aggregate over RAW events whose grain and aggregates are covered
  * by the c9 rollup ([[graft.operators.Rollup]]) is rewritten to the
  * part-merge over the rollup — `count(1) → sum(n)`,
  * `sum(cents) → sum(sum_cents)` — turning a corpus scan into a
  * few-KB read with NO query change, exactly how a ClickHouse
  * projection/materialized view serves a matching GROUP BY. At 100 TB
  * this is the dashboard-query lever: the user keeps writing the
  * natural aggregate over raw events and pays a metadata-sized read.
  *
  * The rewrite fires ONLY when provably safe:
  *  - the aggregate's child is the events relation under at most
  *    column-pruning/ts-normalizing Projects — any Filter disables it
  *    (a filtered aggregate is NOT covered by the unfiltered rollup);
  *  - the grouping keys and aggregate expressions, with Project
  *    aliases inlined and relation attributes identified by name, are
  *    canonically IDENTICAL to the rollup grain (`to_date(ts)`,
  *    `event_type`) and its mergeable aggregates;
  *  - the rollup cache exists and its data-file manifest matches the
  *    corpus RIGHT NOW ([[graft.sources.LocalIndex.freshDir]] — a
  *    grown or regenerated corpus silently falls back to the raw
  *    scan, the ClickHouse parts-freshness contract).
  *
  * The replacement keeps the original output attribute ids (downstream
  * operators resolve against them) and coalesces the merged sums so
  * the output is at least as non-null as what it replaces. Scope is
  * deliberately the DECLARED projection — ClickHouse matches declared
  * projections, not arbitrary queries — and the rewritten plan no
  * longer contains the events relation, so the rule is idempotent. */
object RollupProjection {
  /** Reentrancy guard: the rule optimizes its own REFERENCE plan
    * through the session optimizer (so both sides of the match are in
    * the same normal form — constant-folded, RuntimeReplaceables
    * replaced); while that inner optimization runs, the rule must not
    * fire on the reference itself. */
  private val inRule = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }

  /** Optimized reference aggregate per corpus dir — the declared
    * projection's normal form is static per corpus, so compute once. */
  private val refCache =
    new java.util.concurrent.ConcurrentHashMap[String, Aggregate]()
}

case class RollupProjection(spark: SparkSession) extends Rule[LogicalPlan] {
  import RollupProjection.{inRule, refCache}

  /** events.parquet relation beneath at most Project nodes → (relation,
    * alias-inlining map composed across the Projects). */
  private def eventsRelation(plan: LogicalPlan)
      : Option[(LogicalRelation, Map[Expression, Expression])] = plan match {
    case l: LogicalRelation => Some((l, Map.empty))
    case Project(exprs, child) =>
      eventsRelation(child).map { case (l, inner) =>
        val here: Map[Expression, Expression] = exprs.collect {
          case a: Alias => (a.toAttribute: Expression) -> inline(a.child, inner)
        }.toMap
        (l, inner ++ here)
      }
    case _ => None
  }

  private def inline(e: Expression, sub: Map[Expression, Expression]): Expression =
    e.transformUp { case attr: AttributeReference => sub.getOrElse(attr, attr) }

  /** The corpus dir iff the relation is exactly `<d>/events.parquet`. */
  private def corpusDir(rel: LogicalRelation): Option[String] =
    rel.relation match {
      case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        fs.location.rootPaths match {
          case Seq(p) if p.getName == "events.parquet" =>
            Some(p.getParent.toUri.getPath)
          case _ => None
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (inRule.get()) plan
    else plan.transformUp {
      case agg @ Aggregate(groupExprs, resultExprs, child, _)
          if groupExprs.size == 2 && resultExprs.size == 4 =>
        (for {
          (rel, aliases) <- eventsRelation(child)
          d <- corpusDir(rel)
          rollupDir <- graft.sources.LocalIndex.freshDir(
            "rollup", d, "", Seq(s"$d/events.parquet"), "v1")
          rewritten <- rewrite(agg, rel, aliases, d, rollupDir)
        } yield rewritten).getOrElse(agg)
    }

  private def stripAlias(e: Expression): Expression = e match {
    case a: Alias => a.child
    case other => other
  }

  private def rewrite(agg: Aggregate, rel: LogicalRelation,
      aliases: Map[Expression, Expression], d: String, rollupDir: String)
      : Option[LogicalPlan] = {
    // the DECLARED projection (the c9 rollup grain and its mergeable
    // aggregates), run through the SAME optimizer as the incoming plan
    // — guarded against recursion — so both sides are in one normal
    // form (constant-folded, RuntimeReplaceables replaced); cached per
    // corpus, the normal form is static
    val ref = refCache.computeIfAbsent(d, { _ =>
      inRule.set(true)
      try {
        val analyzed = graft.Tables.events(spark, d)
          .groupBy(to_date(col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sum_cents"))
          .queryExecution.analyzed
        spark.sessionState.executePlan(analyzed).optimizedPlan
          .collectFirst { case a: Aggregate => a }.get
      } finally inRule.set(false)
    })
    val (refRel, refAliases) = eventsRelation(ref.child) match {
      case Some(pair) => pair
      case None => return None
    }
    // map the reference relation's attributes onto the incoming
    // relation's BY NAME, so canonical comparison sees one id space
    val byName: Map[Expression, Expression] = refRel.output.flatMap { a =>
      rel.output.find(_.name == a.name).map(b => (a: Expression) -> (b: Expression))
    }.toMap
    if (byName.size != refRel.output.size) return None
    def canonIn(e: Expression): Expression =
      inline(stripAlias(e), aliases).canonicalized
    def canonRef(e: Expression): Expression =
      inline(inline(stripAlias(e), refAliases), byName).canonicalized
    val matches =
      agg.groupingExpressions.map(canonIn) ==
        ref.groupingExpressions.map(canonRef) &&
      agg.aggregateExpressions.map(e => canonIn(e)) ==
        ref.aggregateExpressions.map(e => canonRef(e))
    if (!matches) None
    else {
      val merged = spark.read.parquet(rollupDir)
        .groupBy(col("day"), col("event_type"))
        .agg(sum(col("n")).as("n"), sum(col("sum_cents")).as("sum_cents"))
        .queryExecution.analyzed
      val out: Seq[NamedExpression] =
        agg.aggregateExpressions.zip(merged.output).map { case (orig, repl) =>
          val e: Expression =
            if (repl.dataType == org.apache.spark.sql.types.LongType &&
                !orig.nullable)
              Coalesce(Seq(repl, Literal(0L)))
            else repl
          Alias(e, orig.name)(exprId = orig.exprId)
        }
      Some(Project(out, merged))
    }
  }
}
