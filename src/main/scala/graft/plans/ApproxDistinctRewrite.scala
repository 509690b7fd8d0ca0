package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, HllSketchEstimate}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HllSketchAgg}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType}

/** Opt-in approximate-mode optimizer rule: when
  * `spark.graft.approx.countDistinct=true`, every eligible
  * `COUNT(DISTINCT x)` rewrites to
  * `hll_sketch_estimate(hll_sketch_agg(x))` — the Datasketches HLL
  * pipeline Spark ships — WITHOUT touching the query text.
  *
  * Why this is an optimizer rule and not a function: at 100 TB an
  * exact distinct aggregate plans as an Expand + a shuffle keyed on
  * the VALUE (every distinct value crosses the wire at least once);
  * the sketch form shuffles one ~2 KB buffer per group per partition
  * regardless of cardinality. Dashboards and profiling queries that
  * tolerate the sketch's documented ~1–2% error (lgK=12) opt in per
  * session — the engine-level switch production warehouses expose as
  * "approximate mode" — and every existing query, TVF, and BI tool on
  * the session inherits it with zero rewrites.
  *
  * Scope guard (correctness over coverage): only single-argument
  * distinct counts over int/long/string/binary rewrite — multi-column
  * `COUNT(DISTINCT a, b)`, other distinct aggregates (`SUM(DISTINCT)`
  * keeps exact semantics), and unsupported input types pass through
  * untouched. `FILTER (WHERE …)` clauses carry over to the sketch
  * aggregate. The rewrite preserves each output attribute (the
  * enclosing `Alias` and its exprId are untouched — only the
  * aggregate function under it changes) and the result type (both
  * spell a BIGINT), so downstream operators re-resolve nothing.
  *
  * The rule is registered by [[graft.GraftExtensions]] via
  * `injectOptimizerRule` and is a no-op unless the session conf opts
  * in. ApproxRewriteSpec pins: rewritten plans carry the sketch
  * aggregate, estimates land within the documented error, grouped and
  * filtered forms rewrite, ineligible shapes do not, and the flag off
  * means byte-identical plans.
  */
class ApproxDistinctRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.approx.countDistinct"

  private def eligible(e: Expression): Boolean = e.dataType match {
    case IntegerType | LongType | StringType | BinaryType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "false").equalsIgnoreCase("true"))
      plan
    else plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case AggregateExpression(
              c @ Count(Seq(child)), mode, true, filter, _)
              if eligible(child) && c.deterministic =>
            HllSketchEstimate(AggregateExpression(
              new HllSketchAgg(child), mode, isDistinct = false,
              filter = filter))
        }
    }
}
