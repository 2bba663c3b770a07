package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native PQ kernels with the codebook as a REFERENCE OBJECT (data in
  * the constant pool) instead of macro-expanded literal calls.
  *
  * The composed form — `array(least(struct(vecsqdist(slice(v, …),
  * <16-double literal>), cid)…)…)` per subspace × codeword — unrolls
  * m×k kernel calls into ONE generated method: 12,014 bytecode bytes
  * at (4, 16) and 26,259 at (8, 16), measured on this repo's own
  * queries. HotSpot refuses to JIT any method over its 8,000-byte
  * `DontCompileHugeMethods` ceiling, so those stages ran INTERPRETED —
  * the per-row corpus encode (the 100 TB ingest scan!) and the
  * per-query ADC tables both sat in the 8 k–65 k band that Spark's own
  * `spark.sql.codegen.hugeMethodLimit` (default 65,535) deliberately
  * ignores. As data, the same codebook is two nested loops and a
  * ~1 KB method that compiles (`CodegenSizeSpec` pins the ceiling).
  *
  * Bit-compatibility is contract, spec-pinned against the composed
  * form on adversarial inputs (null vectors, null elements, short and
  * empty vectors): the distance is the same strict left-to-right
  * `(x−y)²` double fold over `min(available, |codeword|)` elements
  * (slice semantics: a vector ending before the subspace contributes
  * zero terms → distance 0.0), a null input or null element yields a
  * NULL distance, and the argmin replays `least(struct(d, cid))`
  * exactly — null d sorts FIRST (Spark struct ordering), ties break
  * to the lowest cid.
  */
object Pq {

  /** The shared distance rule: d(vec, mi, cw) or null. */
  private[functions] def subDist(vec: ArrayData, get: Int => Double,
                                 vlen: Int, base: Int,
                                 cw: Array[Double]): java.lang.Double = {
    val n = math.min(math.max(0, vlen - base), cw.length)
    var acc = 0.0
    var j = 0
    while (j < n) {
      if (vec.isNullAt(base + j)) return null
      val d = get(base + j) - cw(j)
      acc += d * d
      j += 1
    }
    acc
  }

  /** least(struct(d, cid)) ordering: null d first, then d, then cid —
    * with cid strictly ascending the incumbent keeps ties.
    */
  private[functions] def beats(d: java.lang.Double,
                               best: java.lang.Double): Boolean =
    if (d == null) best != null
    else best != null && d < best
}

/** `pqEncode` as one native expression: array of m argmin codeword
  * ids. Full `doGenCode` — this is the corpus-side INGEST projection
  * (every row of a 100 TB corpus passes through it once), so it must
  * live inside whole-stage codegen as a compilable method.
  */
case class PqCodes(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  require(codebook.nonEmpty && codebook.forall(_.nonEmpty),
    "pq_codes needs a non-empty codebook")
  private val sub = codebook.head.head.size

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"pq_codes input must be array<float|double>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(IntegerType, false)

  // the composed form never returns a null array (a null vector gives
  // every codeword a null distance, and null-d sorts first -> cid 0)
  override def nullable: Boolean = false

  /** codebook(mi)(ci) as primitive arrays for both eval and codegen. */
  @transient private lazy val cbArr: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val vec = v.asInstanceOf[ArrayData]
    val vlen = if (vec == null) 0 else vec.numElements()
    val fl = isFloat
    val get: Int => Double =
      if (vec == null) _ => 0.0
      else if (fl) i => vec.getFloat(i).toDouble
      else i => vec.getDouble(i)
    val out = new Array[Int](cbArr.length)
    var mi = 0
    while (mi < cbArr.length) {
      val base = mi * sub
      var bestCid = 0
      var bestD: java.lang.Double =
        if (vec == null) null
        else Pq.subDist(vec, get, vlen, base, cbArr(mi)(0))
      var ci = 1
      while (ci < cbArr(mi).length) {
        val d: java.lang.Double =
          if (vec == null) null
          else Pq.subDist(vec, get, vlen, base, cbArr(mi)(ci))
        if (Pq.beats(d, bestD)) { bestD = d; bestCid = ci }
        ci += 1
      }
      out(mi) = bestCid
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cbArr, "double[][][]")
    val childGen = child.genCode(ctx)
    val vec = ctx.freshName("vec")
    val vNull = ctx.freshName("vNull")
    val vlen = ctx.freshName("vlen")
    val out = ctx.freshName("out")
    val mi = ctx.freshName("mi")
    val ci = ctx.freshName("ci")
    val cw = ctx.freshName("cw")
    val bestCid = ctx.freshName("bestCid")
    val bestD = ctx.freshName("bestD")
    val bestNull = ctx.freshName("bestNull")
    val d = ctx.freshName("d")
    val dNull = ctx.freshName("dNull")
    val n = ctx.freshName("n")
    val j = ctx.freshName("j")
    val base = ctx.freshName("base")
    val xv = ctx.freshName("xv")
    val getter = if (isFloat) s"(double) $vec.getFloat" else s"$vec.getDouble"
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val body =
      s"""
         |boolean $vNull = ${childGen.isNull};
         |org.apache.spark.sql.catalyst.util.ArrayData $vec =
         |  $vNull ? null : ${childGen.value};
         |int $vlen = $vNull ? 0 : $vec.numElements();
         |int[] $out = new int[$cbRef.length];
         |for (int $mi = 0; $mi < $cbRef.length; $mi++) {
         |  int $base = $mi * $sub;
         |  int $bestCid = 0;
         |  double $bestD = 0.0;
         |  boolean $bestNull = true;
         |  for (int $ci = 0; $ci < $cbRef[$mi].length; $ci++) {
         |    double[] $cw = $cbRef[$mi][$ci];
         |    double $d = 0.0;
         |    boolean $dNull = $vNull;
         |    if (!$dNull) {
         |      int $n = java.lang.Math.min(
         |        java.lang.Math.max(0, $vlen - $base), $cw.length);
         |      for (int $j = 0; $j < $n; $j++) {
         |        if ($vec.isNullAt($base + $j)) { $dNull = true; break; }
         |        double $xv = $getter($base + $j) - $cw[$j];
         |        $d += $xv * $xv;
         |      }
         |    }
         |    if ($ci == 0) { $bestD = $d; $bestNull = $dNull; }
         |    else if ($dNull ? !$bestNull : (!$bestNull && $d < $bestD)) {
         |      $bestD = $d; $bestNull = $dNull; $bestCid = $ci;
         |    }
         |  }
         |  $out[$mi] = $bestCid;
         |}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    ev.copy(
      code = childGen.code + code"$body",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen
        .FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object PqCodes {
  def apply(vec: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    GraftShim.column(PqCodes(GraftShim.expression(vec), cb))
}

/** The per-query ADC distance table as one expression:
  * `tbl[mi][ci] = ‖vec[mi·sub : ] − cb[mi][ci]‖²` (same fold, same
  * slice truncation as [[PqCodes]]), null distances preserved as null
  * ELEMENTS exactly like the composed `array(array(vecsqdist(…)…))`.
  * Query-side only (|Q|×nprobe rows ride a broadcast), so interpreted
  * eval ([[CodegenFallback]]) is deliberate: the containing stage
  * stays compilable and the per-row cost is a compiled Scala loop —
  * strictly better than the 12 KB JIT-refused generated method it
  * replaces.
  */
case class AdcTable(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with CodegenFallback {

  require(codebook.nonEmpty && codebook.forall(_.nonEmpty),
    "adc_table needs a non-empty codebook")
  private val sub = codebook.head.head.size

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"adc_table input must be array<float|double>, got ${other.sql}")
    }

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, true), false)

  override def nullable: Boolean = false

  @transient private lazy val cbArr: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val vec = v.asInstanceOf[ArrayData]
    val vlen = if (vec == null) 0 else vec.numElements()
    val fl = isFloat
    val get: Int => Double =
      if (vec == null) _ => 0.0
      else if (fl) i => vec.getFloat(i).toDouble
      else i => vec.getDouble(i)
    val rows = new Array[Any](cbArr.length)
    var mi = 0
    while (mi < cbArr.length) {
      val base = mi * sub
      val row = new Array[Any](cbArr(mi).length)
      var ci = 0
      while (ci < cbArr(mi).length) {
        row(ci) =
          if (vec == null) null
          else Pq.subDist(vec, get, vlen, base, cbArr(mi)(ci))
        ci += 1
      }
      rows(mi) = new GenericArrayData(row)
      mi += 1
    }
    new GenericArrayData(rows)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object AdcTable {
  def apply(vec: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    GraftShim.column(AdcTable(GraftShim.expression(vec), cb))
}
