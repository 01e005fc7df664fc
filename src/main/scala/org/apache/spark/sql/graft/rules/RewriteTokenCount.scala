package org.apache.spark.sql.graft.rules

import org.apache.spark.sql.catalyst.expressions.{Coalesce, Expression, Literal, Size, StringSplit}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.expressions.TokenCountF
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rewrite: `size(split(text, " "))` →
  * [[TokenCountF]](text) — the corpus token-count idiom computed as
  * one allocation-free byte scan instead of materializing an array of
  * substring objects just to read its length (byte-exact equivalence
  * documented on the expression; pinned in ExtensionsSpec).
  *
  * Fires PER OPERATOR and only when every space-split in that
  * operator sits directly under a Size: if any sibling expression
  * consumes the split array itself (a transform/explode next to the
  * count), Catalyst's subexpression elimination already shares one
  * split and the count is a free array-length read — rewriting there
  * would ADD a byte scan, so the rule stays out. Guards:
  * exact literal-" " pattern (the regex metacharacter-free case) and
  * limit −1. Both Size null semantics are preserved: the
  * null-propagating form maps to the kernel directly; the legacy
  * −1-on-null form (the default under this engine's ANSI-off
  * sessions) wraps it in coalesce(•, −1).
  *
  * Injected by [[graft.GraftExtensions]] via
  * `injectOptimizerRule` — sessions built with
  * `spark.sql.extensions=graft.GraftExtensions`
  * ([[graft.sources.Sessions.builder]]) get it on every query.
  */
object RewriteTokenCount extends Rule[LogicalPlan] {

  private def spaceSplitArg(e: Expression): Option[Expression] = e match {
    case StringSplit(str, Literal(p: UTF8String, _), Literal(-1, IntegerType))
        if p.toString == " " =>
      Some(str)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case op =>
      var splits = 0
      var underSize = 0
      op.expressions.foreach(_.foreach {
        case Size(c, _) if spaceSplitArg(c).isDefined => underSize += 1
        case e if spaceSplitArg(e).isDefined => splits += 1
        case _ =>
      })
      // every split node is visited once by the traversal; equality
      // means each one is the direct child of a Size — the count-only
      // shape the kernel wins on
      if (splits > 0 && splits == underSize)
        op.transformExpressions {
          case Size(c, legacy) if spaceSplitArg(c).isDefined =>
            val counted = TokenCountF(spaceSplitArg(c).get)
            if (legacy) Coalesce(Seq(counted, Literal(-1))) else counted
        }
      else op
  }
}
