package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Evaluate-once barrier for an EXPENSIVE derived column — semantically
  * the identity (same value, same nulls, same codegen as the child),
  * but reported to the optimizer as non-deterministic so the rules
  * that COPY expressions cannot touch it.
  *
  * Why it exists: Catalyst pushes a filter through a Project by
  * SUBSTITUTING the projected expression into the predicate, and
  * collapses adjacent Projects the same way. For a cheap expression
  * that is pure win; for an expensive one referenced many times
  * downstream it multiplies the work per row — the measured case here
  * was `q_prep_pipeline`, whose quality/dedup filters referenced a
  * 3-pass regex redaction: pushdown inlined the redact chain ~18× into
  * one Filter node (56 `regexp_replace` calls per row in the physical
  * plan, re-running three full-text regex passes for every reference).
  * Wrapping the redaction in this barrier keeps ONE Project that
  * evaluates it once; every downstream reference reads the
  * materialized attribute. This is the optimization guide's §4.4
  * device ("mark expensive UDFs non-deterministic to stop the
  * optimizer duplicating them") applied at the expression level.
  *
  * The trade (also §4.4): other predicates will no longer push BELOW
  * the wrapped projection, so apply it to the expensive column only,
  * never blanket — callers should place any scan-prunable filters
  * (partition keys, id ranges) UPSTREAM of the wrap. Wrap only inside
  * Project/Filter/Aggregate/Window operators (the analyzer rejects
  * non-deterministic expressions elsewhere).
  */
case class ComputeOnce(child: Expression) extends UnaryExpression {

  /** The lie that stops expression duplication: the VALUE is fully
    * deterministic (identity of a deterministic child — ComputeOnceSpec
    * pins value equality), only the optimizer contract says otherwise. */
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "compute_once"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)

  override protected def withNewChildInternal(newChild: Expression): ComputeOnce =
    copy(child = newChild)
}

object ComputeOnce {
  /** Column-API entry point: `once(expensiveColumn)`. */
  def once(c: Column): Column = ColumnBridge.column(ComputeOnce(ColumnBridge.expression(c)))
}
