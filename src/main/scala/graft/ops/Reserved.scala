package graft.ops

import org.apache.spark.sql.DataFrame

/** Guard for operator-internal working columns (`__side`, `__pid`,
  * `__z`, …). The multi-stage operators stage intermediate state in
  * extra columns; an input that already carries one of those names
  * would be silently overwritten and corrupt results. Cheap, explicit
  * failure beats a wrong answer — callers rename and retry.
  */
private[graft] object Reserved {

  def requireAbsent(op: String, names: Seq[String], dfs: DataFrame*): Unit = {
    val clash = (for {
      df <- dfs
      n <- names
      if df.columns.contains(n)
    } yield n).distinct
    require(clash.isEmpty,
      s"$op reserves internal working column(s) ${clash.mkString(", ")} " +
        "which already exist in the input; rename them before calling")
  }
}
