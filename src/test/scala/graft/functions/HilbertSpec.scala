package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.CommitLog

/** Hilbert curve: the defining jump-free property proved exhaustively
  * (consecutive curve positions are grid-adjacent — Z-order fails this at
  * every seam), then the clustering rewrite end-to-end: content identical,
  * SQL surface accepted, and min/max file skipping tighter-or-equal to
  * Z-order on the same box workload.
  */
class HilbertSpec extends SparkTestBase {

  private def idx(bits: Int, pt: Long*): Long =
    Hilbert.index(bits, new GenericArrayData(pt.toArray))

  test("2-D curve is a bijection with unit steps — exhaustive at 32x32") {
    val bits = 5; val side = 1 << bits
    val byH = (for (x <- 0 until side; y <- 0 until side)
      yield (idx(bits, x.toLong, y.toLong), x, y)).sortBy(_._1)
    assert(byH.map(_._1) ==
      (0L until side.toLong * side).toIndexedSeq) // bijection onto 0..n-1
    byH.sliding(2).foreach { case Seq((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between ($x1,$y1) and ($x2,$y2)") // the Hilbert property
    }
  }

  test("3-D and 4-D curves: bijection with unit steps, exhaustive") {
    for ((k, bits) <- Seq((3, 3), (4, 2))) {
      val side = 1 << bits
      val pts = Seq.fill(k)(0 until side).foldLeft(Seq(Seq.empty[Long])) {
        (acc, r) => acc.flatMap(p => r.map(v => p :+ v.toLong))
      }
      val byH = pts.map(p => (Hilbert.index(bits, new GenericArrayData(p.toArray)), p))
        .sortBy(_._1)
      assert(byH.map(_._1) == (0L until math.pow(side, k).toLong).toIndexedSeq)
      byH.sliding(2).foreach { case Seq((_, p1), (_, p2)) =>
        assert(p1.zip(p2).map { case (a, b) => math.abs(a - b) }.sum == 1,
          s"$k-D jump between $p1 and $p2")
      }
    }
  }

  test("hilbert clustering: content identical, SQL OPTIMIZE HILBERT BY, " +
      "and box-query file skipping tighter-or-equal to zorder") {
    import spark.implicits._
    // the full 256x256 grid, one row per cell — deterministic 2-D data
    val grid = spark.range(65536L)
      .select((col("id") / 256).cast("long").as("a"),
        (col("id") % 256).cast("long").as("b"), col("id").as("payload"))
    def build(curve: String): String = {
      val root = Files.createTempDirectory(s"graft-hil-$curve").toString
      CommitLog.append(grid, root)
      CommitLog.cluster(spark, root, Seq("a", "b"), nFiles = 16, curve = curve)
      root
    }
    val zRoot = build("zorder"); val hRoot = build("hilbert")
    // content is untouched by either rewrite
    assert(CommitLog.read(spark, hRoot).agg(sum("payload"), count(lit(1)))
      .as[(Long, Long)].head() == (65536L * 65535 / 2, 65536L))
    assert(CommitLog.read(spark, hRoot).exceptAll(grid).isEmpty)
    // min/max skipping on a centered box: count files whose (a,b) boxes
    // intersect — exactly what manifest pruning admits
    def filesAdmitted(root: String, lo: Long, hi: Long): Int = {
      val m = CommitLog.readManifest(root, CommitLog.currentVersion(root).get)
      m.statsOrNil.count { s =>
        Seq("a", "b").forall { c =>
          val mn = s.minsOrEmpty(c).toLong; val mx = s.maxsOrEmpty(c).toLong
          mx >= lo && mn <= hi
        }
      }
    }
    // Boxes chosen UNALIGNED to the Z quadrant grid (a power-of-two-
    // aligned box is contiguous in Z too): each crosses the 64/128/192
    // seams where Z fragments; sum over all four so a ±1-file cut from
    // RangePartitioner's rdd-id-seeded sampling can't flip the verdict.
    val boxes = Seq((40L, 103L), (88L, 151L), (120L, 183L), (25L, 88L))
    val zF = boxes.map { case (lo, hi) => filesAdmitted(zRoot, lo, hi) }.sum
    val hF = boxes.map { case (lo, hi) => filesAdmitted(hRoot, lo, hi) }.sum
    assert(hF <= zF, s"hilbert admitted $hF files vs zorder $zF")
    assert(hF < boxes.size * 16, s"hilbert skipped nothing ($hF)")
    // SQL surface: OPTIMIZE ... HILBERT BY over a fresh copy
    val sRoot = Files.createTempDirectory("graft-hil-sql").toString
    CommitLog.append(grid, sRoot)
    val view = s"hil_${java.util.UUID.randomUUID().toString.replace('-', '_')}"
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $view " +
      s"USING `graft-commitlog` OPTIONS (path '$sRoot')")
    val v = spark.sql(s"OPTIMIZE $view HILBERT BY (a, b)").collect().head.getLong(0)
    assert(v == 2L)
    // RangePartitioner's sample seed rides the RDD id, so two runs may cut
    // the curve at slightly different ranks — assert the skipping PROPERTY
    // (a curve layout admits a strict subset of files on the box), not
    // file-identical layout
    val sF = boxes.map { case (lo, hi) => filesAdmitted(sRoot, lo, hi) }.sum
    assert(sF <= zF && sF < boxes.size * 16,
      s"SQL hilbert admitted $sF files (zorder $zF)")
  }
}
