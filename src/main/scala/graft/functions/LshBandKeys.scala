package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** The deterministic random-hyperplane family shared by the sign-LSH
  * operators (graft.operators.Similarity q35/q45): plane r's component d is
  * an md5-derived integer in [-500000, 500000] — exactly representable as
  * float AND double, so Spark's float path and an oracle's double path
  * compute identical products. Indexable at ANY r: band geometry that
  * scales with corpus size can draw as many planes as it derives.
  */
object SignLsh {
  def plane(r: Int, dims: Int): Array[Float] = Array.tabulate(dims) { d =>
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$r:$d".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    ((java.lang.Long.parseLong(hex, 16) % 1000001L) - 500000L).toFloat
  }

  /** Flat row-major [bands·width × dims] plane matrix — band b's bit i uses
    * plane b·width+i at offset (b·width+i)·dims.
    */
  def planesFlat(width: Int, bands: Int, dims: Int): Array[Float] = {
    val out = new Array[Float](bands * width * dims)
    var r = 0
    while (r < bands * width) {
      System.arraycopy(plane(r, dims), 0, out, r * dims, dims)
      r += 1
    }
    out
  }
}

/** All sign-LSH band keys of one embedding in ONE native expression:
  * `keys[b] = Σ_i [float_dot_q(emb, plane(b·width+i)) ≥ 0] << i` as
  * `array<bigint>` of length `bands`.
  *
  * Exists because the composed form — bands·width separate
  * `float_dot_q(col, typedlit(plane))` columns — carries a 64-float literal
  * per plane into the plan: at corpus-adaptive geometry (17 bands × 17 bits
  * = 289 planes at the sf1 sweep) the generated class blows janino's 64 KB
  * method limit and the whole stage falls back to interpreted evaluation.
  * Here the plane matrix rides ONE `addReferenceObj` float[] and the row
  * pays a single tight primitive loop (bands·width·dims multiplies, no
  * allocation beyond the key array), keeping whole-stage codegen alive at
  * any geometry. Per-bit sign semantics are exactly float_dot_q's
  * (quantized-sum sign), so keys are bit-identical to the composed form.
  */
case class LshBandKeys(child: Expression, width: Int, bands: Int, dims: Int)
    extends UnaryExpression {

  require(width > 0 && width <= 63 && bands > 0 && dims > 0,
    s"lsh_band_keys needs 0 < width ≤ 63, bands > 0, dims > 0; " +
      s"got width=$width bands=$bands dims=$dims")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_band_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> argument, got ${other.simpleString}")
  }

  @transient private lazy val planes: Array[Float] =
    SignLsh.planesFlat(width, bands, dims)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dims)
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var i = 0
      while (i < width) {
        val off = (b * width + i) * dims
        var acc = 0L
        var d = 0
        while (d < n) {
          acc += math.floor(
            x.getFloat(d).toDouble * planes(off + d).toDouble * 1.0e9).toLong
          d += 1
        }
        if (acc >= 0L) key |= 1L << i
        i += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pl = ctx.addReferenceObj("planes", planes, "float[]")
      val n = ctx.freshName("n")
      val keys = ctx.freshName("keys")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val key = ctx.freshName("key")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dims);
         |long[] $keys = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $key = 0L;
         |  for (int $i = 0; $i < $width; $i++) {
         |    int $off = ($b * $width + $i) * $dims;
         |    long $acc = 0L;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $acc += (long) java.lang.Math.floor(
         |        ((double) $a.getFloat($d)) * ((double) $pl[$off + $d]) * 1.0E9);
         |    }
         |    if ($acc >= 0L) $key |= 1L << $i;
         |  }
         |  $keys[$b] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
