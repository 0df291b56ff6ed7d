package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** 1e9-quantized dot product of two float arrays as a native Catalyst
  * expression: `sum_i floor((a[i]*b[i]) * 1e9)` as BIGINT.
  *
  * Semantically identical to the higher-order
  * `aggregate(zip_with(a, b, (x,y) -> floor((x*y)*1e9)), 0L, (acc,p) -> acc+p)`
  * but ~2 orders of magnitude faster: the higher-order form allocates an
  * intermediate array and evaluates two interpreted lambdas per element,
  * while this compiles to a tight primitive loop inside whole-stage codegen
  * (no allocation, no boxing). At 2M candidate pairs × 64 dims the
  * interpreted form was the bench bottleneck (47 s → sub-second loop).
  *
  * The quantization exists for cross-engine / cross-run determinism: floor
  * of a double is exact, integer sums are order-independent, so results are
  * bit-identical between Spark and the DuckDB oracle and between cluster
  * runs (see graft.operators.Similarity).
  */
case class FloatDotQ(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "float_dot_q"

  // `getFloat` on a double-backed ArrayData reads 4 of 8 bytes (unsafe) or
  // throws (generic) — non-float arrays must fail at ANALYSIS, not produce
  // garbage. ExpectsInputTypes is private[sql], so enforce via
  // checkInputDataTypes directly.
  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val p = (x.getFloat(i).toDouble * y.getFloat(i).toDouble) * 1.0e9
      acc += math.floor(p).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val p = ctx.freshName("p")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $p = (((double) $a.getFloat($i)) * ((double) $b.getFloat($i))) * 1.0E9;
         |  $acc += (long) java.lang.Math.floor($p);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Escape-aware splitting for the SQL-literal spec formats (bpe_encode
  * merge lists, unigram_score vocabularies): symbols/pieces may contain the
  * format's own separators, escaped with a backslash. Splitting KEEPS
  * escapes so nested splits stay correct; [[unescape]] runs once on the
  * terminal symbol.
  */
private[functions] object SpecFormat {
  def splitKeepEscapes(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        cur.append(c).append(s.charAt(i + 1)); i += 2
      } else if (c == sep) {
        out += cur.toString; cur.clear(); i += 1
      } else { cur.append(c); i += 1 }
    }
    out += cur.toString
    out.result()
  }

  /** Index of the last UNESCAPED occurrence of `sep`, or -1. */
  def lastUnescaped(s: String, sep: Char): Int = {
    var i = 0
    var last = -1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) i += 2
      else { if (c == sep) last = i; i += 1 }
    }
    last
  }

  def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) { sb.append(s.charAt(i + 1)); i += 2 }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}

/** Session-scoped registration of graft's native expressions. */
object GraftFunctions {
  // once per session: every operator entry point calls register() (so each
  // works standalone), but re-registering emits a SimpleFunctionRegistry
  // WARN per call — hundreds of them across a bench run, enough to push
  // the result JSON out of a log tail. Weak keys: don't pin stopped
  // sessions.
  private val registered = java.util.Collections.newSetFromMap(
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]))

  /** Idempotent; call before using `float_dot_q(...)` in expr()/SQL. */
  def register(s: SparkSession): Unit = {
    if (!registered.add(s)) return
    val reg = s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    reg.createOrReplaceTempFunction("float_dot_q",
      (args: Seq[Expression]) => {
        require(args.length == 2, "float_dot_q takes exactly 2 arguments")
        FloatDotQ(args.head, args(1))
      },
      "built-in")
    reg.createOrReplaceTempFunction("quantize_vec",
      (args: Seq[Expression]) => {
        require(args.length == 1, "quantize_vec takes exactly 1 argument")
        QuantizeVec(args.head)
      },
      "built-in")
    reg.createOrReplaceTempFunction("sqdist_q",
      (args: Seq[Expression]) => {
        require(args.length == 2, "sqdist_q takes exactly 2 arguments")
        SqDistQ(args.head, args(1))
      },
      "built-in")
    reg.createOrReplaceTempFunction("vec_sum_q",
      (args: Seq[Expression]) => {
        require(args.length == 1, "vec_sum_q takes exactly 1 argument")
        VecSumL(args.head).toAggregateExpression()
      },
      "built-in")
    reg.createOrReplaceTempFunction("vec_min_q",
      (args: Seq[Expression]) => {
        require(args.length == 1, "vec_min_q takes exactly 1 argument")
        VecExtremeL(args.head, isMin = true).toAggregateExpression()
      },
      "built-in")
    reg.createOrReplaceTempFunction("vec_max_q",
      (args: Seq[Expression]) => {
        require(args.length == 1, "vec_max_q takes exactly 1 argument")
        VecExtremeL(args.head, isMin = false).toAggregateExpression()
      },
      "built-in")
    reg.createOrReplaceTempFunction("sq8_dec",
      (args: Seq[Expression]) => {
        require(args.length == 3, "sq8_dec takes (vq, mn, mx)")
        Sq8Dec(args.head, args(1), args(2))
      },
      "built-in")
    reg.createOrReplaceTempFunction("simhash60",
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash60 takes exactly 1 argument")
        SimHash60(args.head).toAggregateExpression()
      },
      "built-in")
    reg.createOrReplaceTempFunction("capped_long_set",
      (args: Seq[Expression]) => {
        require(args.length == 2, "capped_long_set takes (value, cap)")
        val cap = args(1) match {
          case e if e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType =>
            e.eval().asInstanceOf[Int]
          case other => throw new IllegalArgumentException(
            s"capped_long_set cap must be an INT literal, got $other")
        }
        CappedLongSet(args.head, cap).toAggregateExpression()
      },
      "built-in")
    // Spark's own runtime-filter machinery (InjectRuntimeFilter's
    // BloomFilterAggregate / BloomFilterMightContain), exposed as callable
    // functions so an operator can build a semi-join prescreen explicitly:
    // aggregate the small side's xxhash64 keys into one mergeable bloom
    // sketch, then filter the big side with the codegen'd membership
    // probe before the exact join. Not a reimplementation — the engine's
    // own sketch classes, so the bit layout matches what AQE's injected
    // runtime filters use.
    reg.createOrReplaceTempFunction("bloom_agg",
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "bloom_agg takes (xxhash64 value, estimatedItems, numBits)")
        def asLongLit(e: Expression, what: String): Expression = e match {
          case l if l.foldable &&
              (l.dataType == org.apache.spark.sql.types.IntegerType ||
                l.dataType == org.apache.spark.sql.types.LongType) =>
            org.apache.spark.sql.catalyst.expressions.Literal(
              l.eval().toString.toLong)
          case other => throw new IllegalArgumentException(
            s"bloom_agg $what must be an integral literal, got $other")
        }
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(args.head,
            asLongLit(args(1), "estimatedItems"), asLongLit(args(2), "numBits"))
          .toAggregateExpression()
      },
      "built-in")
    // Unicode NFC normalization (text hygiene before tokenize/dedup) —
    // named to match DuckDB's function, which is what lets the q134
    // oracle value-prove Java's normalizer against utf8proc's.
    reg.createOrReplaceTempFunction("hilbert_index",
      (args: Seq[Expression]) => {
        require(args.length == 1,
          "hilbert_index takes exactly 1 array<bigint> argument")
        HilbertIndexExpr(args.head)
      },
      "built-in")
    reg.createOrReplaceTempFunction("nfc_normalize",
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfc_normalize takes exactly 1 argument")
        NfcNormalize(args.head)
      },
      "built-in")
    // BPE encoding for SQL/JDBC clients: merge list as a literal spec
    // ("a b,th e" — pairs comma-separated, symbols space-separated).
    // Symbols CAN contain the separators (whitespace-split words keep
    // their commas, so a learned merge like "a, b" is legitimate — ADVICE
    // r7 caught the old parser silently mis-pairing those): escape a
    // literal ',' or ' ' inside a symbol as '\,' / '\ ' ('\\' for a
    // backslash). Same native expression the Scala API uses (which takes
    // the pair list directly and needs no escaping).
    reg.createOrReplaceTempFunction("bpe_encode",
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "bpe_encode takes (text, 'a b,ab c,...' merge spec)")
        val spec = args(1) match {
          case e if e.foldable &&
              e.dataType == org.apache.spark.sql.types.StringType =>
            String.valueOf(e.eval())
          case other => throw new IllegalArgumentException(
            s"bpe_encode merge spec must be a STRING literal, got $other")
        }
        val merges = SpecFormat.splitKeepEscapes(spec, ',')
          .filter(_.trim.nonEmpty)
          .map { p =>
            val ab = SpecFormat.splitKeepEscapes(p, ' ').filter(_.nonEmpty)
            require(ab.length == 2,
              s"bad merge entry '$p' — want 'left right' (escape a literal " +
                "',' or ' ' inside a symbol as '\\,' / '\\ ')")
            (SpecFormat.unescape(ab(0)), SpecFormat.unescape(ab(1)))
          }
        BpeEncode(args.head, merges)
      },
      "built-in")
    // Unigram-LM Viterbi word scoring for SQL/JDBC clients: vocabulary as
    // a literal spec ("th:-45,e:-30|unk:-100"). Same native expression
    // the Scala API uses.
    reg.createOrReplaceTempFunction("unigram_score",
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "unigram_score takes (word, 'p:s,p:s|unk:floor' vocab spec)")
        val spec = args(1) match {
          case e if e.foldable &&
              e.dataType == org.apache.spark.sql.types.StringType =>
            String.valueOf(e.eval())
          case other => throw new IllegalArgumentException(
            s"unigram_score vocab spec must be a STRING literal, got $other")
        }
        val (pieces, unk) = UnigramScore.parseSpec(spec)
        UnigramScore(args.head, pieces, unk)
      },
      "built-in")
    reg.createOrReplaceTempFunction("bloom_might_contain",
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "bloom_might_contain takes (bloom binary, xxhash64 value)")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          args.head, args(1))
      },
      "built-in")
  }
}
