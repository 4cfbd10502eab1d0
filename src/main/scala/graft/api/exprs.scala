package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions
import org.apache.spark.sql.types.DataType

/** The reference's 9-variant logical expression language
  * (reference src/logical_plan/mod.rs:312-625), mapped onto Catalyst
  * `Column` operations per SURVEY §2.5 — including the pieces the
  * reference declared but left broken (AND: §2.6 item 6; CAST lowering:
  * item 5; Count/Min lowering: items 3-4).
  *
  * Null-equality semantics (SURVEY §7.4 item 1): the reference defines
  * `Null == Null → true` (datatypes/mod.rs:183), which is SQL's `<=>`,
  * not `=`. We expose both: [[eq]] is SQL `=` (the default), and
  * [[eqNullSafe]] is the reference's semantics.
  */
object exprs {

  /** Column reference by name (logical_plan/mod.rs:312-351). */
  def col(name: String): Column = functions.col(name)

  /** String/long literals (logical_plan/mod.rs:375-425). */
  def lit(v: Any): Column = functions.lit(v)

  /** SQL equality (`=`; null-rejecting three-valued logic). */
  def eq(l: Column, r: Column): Column = l === r

  /** The reference's equality: `Null == Null → true`
    * (datatypes/mod.rs:182-183) — Spark's `<=>`. */
  def eqNullSafe(l: Column, r: Column): Column = l <=> r

  /** Boolean AND — declared-but-`todo!()` in the reference
    * (expression/mod.rs:116-143). */
  def and(l: Column, r: Column): Column = l && r

  /** CAST — logical node with no physical lowering in the reference
    * (SURVEY §2.6 item 5). */
  def cast(c: Column, to: DataType): Column = c.cast(to)
  def cast(c: Column, to: String): Column = c.cast(to)

  // ---- aggregate functions (logical_plan/mod.rs:446-555) ----------

  def min(c: Column): Column = functions.min(c)
  def max(c: Column): Column = functions.max(c)

  /** Count — the reference declares Int32 output
    * (logical_plan/mod.rs:537-541); we keep Spark's Long and document
    * the divergence (SURVEY §7.4 item 4). */
  def count(c: Column): Column = functions.count(c)

  /** Sum — Int32-only-with-panic in the reference
    * (accumulator/mod.rs:47-50); generic here. */
  def sum(c: Column): Column = functions.sum(c)
}
