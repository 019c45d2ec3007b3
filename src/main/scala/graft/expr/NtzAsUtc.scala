package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, TimestampNTZType, TimestampType}

/** Reinterprets a `TIMESTAMP_NTZ` value as a UTC instant
  * (`TimestampType`) without consulting the session time zone.
  *
  * Both types are physically microseconds-since-epoch `Long`s; an NTZ
  * value's internal micros ARE the epoch micros of its wall clock read
  * as UTC. So "this naive timestamp is UTC wall-clock" — the contract
  * the testdata generator ships for `events.ts`
  * (reference keeps the same storage-leniency stance,
  * backend/app/utils.py:520-528) — is an identity reinterpretation,
  * codegen'd to a plain copy. Unlike `cast(ntz AS timestamp)`, which
  * reads the wall clock in `spark.sql.session.timeZone` (so the epoch
  * silently shifts on a non-UTC session, and [[graft.Tables.events]]
  * used to have to mutate the session zone to compensate), this is
  * correct on ANY session with zero side effects.
  */
case class NtzAsUtc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == TimestampNTZType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ntz_as_utc requires a timestamp_ntz argument, got ${child.dataType}")
  override def dataType: DataType = TimestampType
  override def prettyName: String = "ntz_as_utc"

  // identical physical representation: the µs Long passes through
  override protected def nullSafeEval(input: Any): Any = input

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)

  override protected def withNewChildInternal(newChild: Expression): NtzAsUtc =
    copy(child = newChild)
}

object NtzAsUtc {
  /** Column-API entry point: `ntzAsUtc($"ts")`. */
  def ntzAsUtc(c: Column): Column =
    ColumnBridge.column(NtzAsUtc(ColumnBridge.expression(c)))
}
