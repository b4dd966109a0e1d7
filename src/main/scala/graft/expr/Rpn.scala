package graft.expr

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Normalize

/** RPN expression compiler — the numerix expression language (SURVEY U1).
  *
  * The reference evaluates whitespace-separated postfix expressions over
  * named column vectors with a runtime stack machine
  * (`numerix/src/pkg/rust_matrix_frame/matrix.rs:29-78` op tables,
  * `:130-201` evaluator; expressions like `"a b c * *"` registered per
  * compute_id, `quick-start/db-init/scripts/init-etcd.sh:16`). Here the
  * stack machine runs once at PLAN time, emitting a Catalyst `Column`
  * tree — Tungsten codegen then executes fused vector kernels, so there
  * is no row-at-a-time interpreter anywhere.
  *
  * Semantics matched from the reference op tables:
  *  - arithmetic `+ - * / ^` elementwise in double; `/` on zero and
  *    `log` on ≤0 fail the query in strict mode (fp32_ops.rs:58-76,
  *    207-222 return errors) — `raise_error` reproduces that;
  *  - comparisons `> < >= <= ==` emit 0.0/1.0 vectors;
  *  - boolean `& |` require 0/1 inputs (strict mode enforces);
  *  - `min max exp log abs` elementwise;
  *  - normalization ops consume the stack top as a whole column:
  *    `norm_min_max`, `norm_percentile_0_99`, `norm_percentile_5_95`,
  *    `percentile_rank` (fp32_ops.rs:239-348).
  */
object Rpn {

  private val binaryOps = Set("+", "-", "*", "/", "^", ">", "<", ">=",
    "<=", "==", "&", "|", "min", "max")
  private val unaryOps = Set("exp", "log", "abs")
  private val normOps = Set("norm_min_max", "norm_percentile_0_99",
    "norm_percentile_5_95", "percentile_rank")

  private def num(tok: String): Option[Double] =
    try Some(tok.toDouble) catch { case _: NumberFormatException => None }

  /** Compile and apply `expr` over `df`, adding the result as `out`.
    * Normalization ops materialize the stack top as a temp column and
    * rewrite it via [[Normalize]]; everything else stays one fused
    * projection.
    *
    * `fp32 = true` selects the reference's f32 compute mode (numerix
    * dispatches f32 vs f64 kernels per request,
    * `numerix/src/handler/handler.rs:120-174`, `ops/fp32_ops.rs`):
    * inputs and literals load as FloatType and every op result is a
    * FloatType column, so the whole chain rounds to 24-bit at each
    * step exactly like the f32 kernels. `+ - * min max` and the
    * comparisons are bit-identical to native f32 (their double results
    * are exact before the float cast); `/ ^ exp log` are computed in
    * double and rounded once to float — within 1 ulp of a native
    * f32 libm, which itself varies by platform.
    */
  def apply(df0: DataFrame, rpn: String, out: String,
      strict: Boolean = true, fp32: Boolean = false): DataFrame = {

    val ftype = if (fp32) "float" else "double"
    // comparison/boolean results are 0/1 vectors IN the compute dtype
    val one: Column = if (fp32) lit(1.0f) else lit(1.0)
    val zero: Column = if (fp32) lit(0.0f) else lit(0.0)
    // ops whose Spark implementation computes in double regardless of
    // input dtype get one rounding step back to the compute dtype
    def inMode(c: Column): Column = if (fp32) c.cast(ftype) else c

    def bool01(c: Column, side: String, op: String): Column =
      if (!strict) c
      else when(c =!= 0.0 && c =!= 1.0,
        raise_error(concat(lit(s"non-boolean $side input to '$op': "), c.cast("string"))))
        .otherwise(c)

    var df = df0
    var tmpId = 0
    var stack = List.empty[Column]

    def applyNorm(op: String): Unit = {
      val tmp = s"__rpn_tmp_$tmpId"; tmpId += 1
      df = df.withColumn(tmp, stack.head.cast("double"))
      df = op match {
        case "norm_min_max"         => Normalize.minMax(df, tmp, tmp + "n")
        case "norm_percentile_0_99" => Normalize.percentileClamp(df, tmp, 0.0, 0.99, tmp + "n")
        case "norm_percentile_5_95" => Normalize.percentileClamp(df, tmp, 0.05, 0.95, tmp + "n")
        case "percentile_rank"      => Normalize.percentRank(df, tmp, tmp + "n")
      }
      df = df.drop(tmp)
      stack = inMode(col(tmp + "n")) :: stack.tail
    }

    val tokens = rpn.trim.split("\\s+").filter(_.nonEmpty)
    require(tokens.nonEmpty, "empty RPN expression")

    for (tok <- tokens) tok match {
      case op if binaryOps(op) =>
        require(stack.size >= 2, s"stack underflow at '$op'")
        val b = stack.head; val a = stack(1)
        val r: Column = op match {
          case "+" => a + b
          case "-" => a - b
          case "*" => a * b
          case "/" =>
            // ANSI mode (Spark 4 default) already fails the query on
            // division by zero, matching numerix; non-strict mode keeps
            // Spark's legacy null semantics via try_divide.
            // Spark's Divide always computes in double — inMode rounds
            // back to float for f32 requests
            inMode(if (strict) a / b else try_divide(a, b))
          case "^"   => inMode(pow(a, b))
          case ">"   => when(a > b, one).otherwise(zero)
          case "<"   => when(a < b, one).otherwise(zero)
          case ">="  => when(a >= b, one).otherwise(zero)
          case "<="  => when(a <= b, one).otherwise(zero)
          case "=="  => when(a === b, one).otherwise(zero)
          case "&"   => when((bool01(a, "left", "&") === 1.0) &&
                             (bool01(b, "right", "&") === 1.0), one).otherwise(zero)
          case "|"   => when((bool01(a, "left", "|") === 1.0) ||
                             (bool01(b, "right", "|") === 1.0), one).otherwise(zero)
          case "min" => least(a, b)
          case "max" => greatest(a, b)
        }
        stack = r :: stack.drop(2)

      case op if unaryOps(op) =>
        require(stack.nonEmpty, s"stack underflow at '$op'")
        val a = stack.head
        val r = op match {
          case "exp" => inMode(exp(a))
          case "log" =>
            inMode(if (strict)
              when(a <= 0.0, raise_error(lit("log of non-positive value"))).otherwise(log(a))
            else log(a))
          case "abs" => abs(a)
        }
        stack = r :: stack.tail

      case op if normOps(op) =>
        require(stack.nonEmpty, s"stack underflow at '$op'")
        applyNorm(op)

      case tok => num(tok) match {
        case Some(d) => stack = (if (fp32) lit(d.toFloat) else lit(d)) :: stack
        case None =>
          require(df.columns.contains(tok), s"unknown column or op '$tok'")
          stack = col(tok).cast(ftype) :: stack
      }
    }
    require(stack.size == 1,
      s"malformed RPN: ${stack.size} values left on stack")
    df.withColumn(out, stack.head)
  }
}
