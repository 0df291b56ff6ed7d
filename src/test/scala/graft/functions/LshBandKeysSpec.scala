package graft.functions

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class LshBandKeysSpec extends SparkTestBase {

  test("band keys are bit-identical to the composed per-plane float_dot_q form") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val dims = 8
    val (w, nb) = (5, 3)
    val df = Seq(
      Tuple1(Array.tabulate(dims)(d => (d - 3).toFloat * 0.75f)),
      Tuple1(Array.tabulate(dims)(d => math.sin(d + 1).toFloat)),
      Tuple1(Array.fill(dims)(0.0f)))
      .toDF("embedding")
    val native = df.select(GraftBridge.column(LshBandKeys(
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
        Seq("embedding")), w, nb, dims)).as("keys"))
    val composed = df.select(array((0 until nb).map { b =>
      (0 until w).map { i =>
        when(call_function("float_dot_q", col("embedding"),
            typedlit(SignLsh.plane(b * w + i, dims))) >= 0L, lit(1L << i))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*).as("keys"))
    val a = native.collect().map(_.getSeq[Long](0))
    val c = composed.collect().map(_.getSeq[Long](0))
    assert(a.toSeq.map(_.toSeq) == c.toSeq.map(_.toSeq))
  }

  test("interpreted eval matches codegen path and null propagates") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val emb = Array(1.0f, -2.0f, 0.5f, 3.0f)
    val e = LshBandKeys(
      Literal.create(ArrayData.toArrayData(emb), ArrayType(FloatType)), 4, 2, 4)
    val keys = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    // hand-fold the same quantized-sign definition
    val expect = (0 until 2).map { b =>
      (0 until 4).foldLeft(0L) { (k, i) =>
        val pl = SignLsh.plane(b * 4 + i, 4)
        val acc = emb.indices.map(d =>
          math.floor(emb(d).toDouble * pl(d).toDouble * 1e9).toLong).sum
        if (acc >= 0L) k | (1L << i) else k
      }
    }
    assert(keys.toSeq == expect)
    val nul = LshBandKeys(Literal.create(null, ArrayType(FloatType)), 4, 2, 4)
    assert(nul.eval(null) == null)
  }

  test("lshBandGeometry tracks corpus size and reproduces the historic 6x8 at small n") {
    import graft.operators.Similarity
    assert(Similarity.lshBandGeometry(64, 0.95) == (8, 6))
    val (w1, b1) = Similarity.lshBandGeometry(2050, 0.95)
    val (w2, b2) = Similarity.lshBandGeometry(20050, 0.95)
    assert(w2 > w1, "key width must grow with the corpus")
    assert(w1 >= 8 && w2 <= 24 && b1 >= 3 && b2 <= 24)
    // expected candidate volume B*n^2/2^(w+1) must stay ~linear in n:
    def cand(n: Long) = {
      val (w, b) = Similarity.lshBandGeometry(n, 0.95)
      b.toDouble * n * n / math.pow(2.0, (w + 1).toDouble)
    }
    assert(cand(20050) / cand(2050) < 20.0, "candidate volume went superlinear")
  }
}
