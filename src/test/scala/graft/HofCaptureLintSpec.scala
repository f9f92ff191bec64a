package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._

/** Static lint for the HOF-capture bug class — an expensive
  * expression (split / regexp / array sort) written INSIDE a
  * higher-order-function lambda without referencing the lambda's
  * element variable. Catalyst evaluates the lambda body once per
  * array element and does NOT hoist loop-invariant subtrees, so a
  * captured `split(text)` inside an `aggregate` over that same
  * split's output re-tokenizes the document per token — O(n²) per
  * row. Three rounds running this class was found by BENCHMARKING
  * (`dedup_ngram_jaccard` r12, `text_readability` r13,
  * `text_entropy` r14, each a 5–10× hot-path cost); this spec makes
  * the pattern un-reintroducible by walking every catalog entry's
  * ANALYZED plan (pre-optimization, so nothing is folded away) and
  * failing on any expensive lambda subtree that reads column data
  * but no lambda variable.
  *
  * Precision notes: a subtree referencing ANY NamedLambdaVariable
  * (its own lambda's or an enclosing one's) varies per element at
  * some loop level and is legitimate per-element work; a subtree
  * referencing only literals is constant-folded by the optimizer and
  * harmless. Only the column-derived, lambda-invariant case — the
  * exact shape of all three historical bugs — is flagged.
  */
class HofCaptureLintSpec extends SparkSpec {

  private def isExpensive(e: Expression): Boolean = e match {
    case _: StringSplit | _: SortArray | _: ArraySort | _: ArrayDistinct |
         _: RegExpReplace | _: RegExpExtract | _: RegExpExtractAll => true
    case _ => false
  }

  /** Every (entry-local description of a) loop-invariant expensive
    * subtree inside a HOF lambda anywhere in the plan.
    */
  private def capturedSubtrees(plan: LogicalPlan): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    plan.foreach { node =>
      node.expressions.foreach { root =>
        root.foreach {
          case hof: HigherOrderFunction =>
            hof.functions.foreach {
              case LambdaFunction(body, _, _) =>
                body.foreach { sub =>
                  if (isExpensive(sub) &&
                    !sub.exists(_.isInstanceOf[NamedLambdaVariable]) &&
                    sub.exists(_.isInstanceOf[AttributeReference]))
                    out += s"${hof.prettyName} captures: ${sub.sql.take(160)}"
                }
              case _ =>
            }
          case _ =>
        }
      }
    }
    out.toSeq
  }

  test("no catalog entry evaluates a column-derived expensive " +
    "expression per array element (the entropy/readability/jaccard " +
    "bug class)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val hits = capturedSubtrees(
          fn(spark, sf).queryExecution.analyzed)
        hits.map(h => s"$name → $h")
    }
    assert(offenders.isEmpty,
      s"HOF-captured invariant work found:\n${offenders.mkString("\n")}")
  }

  test("the lint catches the historical entropy form when planted") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // the r14 bug shape: the fold's body re-tokenizes `text` (no
    // reference to the lambda element w) — once per token
    val planted = docs.select(
      transform(split(col("text"), " "),
        w => size(split(col("text"), " "))).as("per_token_retokenize"))
    val hits = capturedSubtrees(planted.queryExecution.analyzed)
    assert(hits.nonEmpty, "the planted capture must be flagged")
    assert(hits.exists(_.contains("split")), hits.mkString("\n"))
  }
}
