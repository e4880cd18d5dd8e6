package org.apache.spark.sql.graft

import java.text.Normalizer
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** F4 — Unicode NFKD → ASCII fold as a native Catalyst expression
  * (round-1 verdict #10: the one remaining Scala UDF upgraded). Strips
  * combining marks after compatibility decomposition, lowercases, trims —
  * the reference's `unicodedata`-based normalization
  * (`ingestion_script.py:282-290`), byte-identical to the previous UDF.
  *
  * Unlike a Scala UDF, this stays inside whole-stage codegen: no
  * encoder/serde boundary, no closure dispatch — the generated code calls
  * the static [[AsciiFold.fold]] helper directly, and the expression
  * participates in null-propagation and constant-folding like any
  * built-in. (The fold itself is Normalizer + one precompiled regex —
  * the win is removing the UDF wrapper, not the string work.)
  */
case class AsciiFold(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override protected def nullSafeEval(s: Any): Any =
    AsciiFold.fold(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.AsciiFold$$.MODULE$$.fold($c)")

  override protected def withNewChildInternal(newChild: Expression): AsciiFold =
    copy(child = newChild)
}

object AsciiFold {
  private val marks = Pattern.compile("\\p{M}")

  def fold(s: UTF8String): UTF8String = {
    val normalized = Normalizer.normalize(s.toString, Normalizer.Form.NFKD)
    // Locale.ROOT: default-locale lowercasing is environment-dependent
    // (tr-TR folds 'I' to dotless 'ı'), which would break the
    // cross-engine-identical contract with DuckDB's lower() (ADVICE r2)
    UTF8String.fromString(marks.matcher(normalized).replaceAll("")
      .toLowerCase(java.util.Locale.ROOT).trim)
  }
}

object StringExpressions {
  /** Column-API surface for [[AsciiFold]]. */
  def asciiFold(c: Column): Column =
    ExpressionUtils.column(AsciiFold(ExpressionUtils.expression(c)))
}
