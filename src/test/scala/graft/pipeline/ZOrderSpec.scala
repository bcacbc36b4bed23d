package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave: hand-checked Morton codes") {
    // (x=0b101, y=0b011) → z bits (msb…lsb) = y2x2 y1x1 y0x0 = 011011
    val out = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.interleave(col("x"), col("y"), 3).as("z"))
      .as[Long].head()
    assert(out === Integer.parseInt("011011", 2).toLong)
  }

  test("interleave is a bijection on the cell grid") {
    val n = 8
    val grid = for { x <- 0 until n; y <- 0 until n } yield (x.toLong, y.toLong)
    val zs = grid.toDF("x", "y")
      .select(ZOrder.interleave(col("x"), col("y"), 3).as("z"))
      .as[Long].collect().toSeq
    assert(zs.distinct.size === n * n)
    assert(zs.min === 0L && zs.max === (n * n - 1).toLong)
  }

  test("cell: equal-width bucketing with edge clamping") {
    val out = Seq(-5.0, 0.0, 24.9, 25.0, 49.9, 50.0, 99.0)
      .toDF("v")
      .select(ZOrder.cell(col("v"), 0.0, 50.0, 3).as("c"))
      .as[Long].collect().toSeq
    // 8 cells of width 6.25 over [0,50); out-of-domain clamps to 0 / 7
    assert(out === Seq(0L, 0L, 3L, 4L, 7L, 7L, 7L))
  }

  test("locality: z-order files prune a 2D box better than a linear layout") {
    // uniform 64×64 grid; BOTH layouts get 64 files of 64 rows — the
    // comparison is layout, not file count
    val pts = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toDouble, y.toDouble)).toDF("x", "y")
    val z = ZOrder.zValue(col("x"), 0.0, 64.0, col("y"), 0.0, 64.0, 6)
    val zFiles = pts.withColumn("f", z.divide(64).cast("long"))
    val linFiles = pts.withColumn("f",
      ZOrder.cell(col("x"), 0.0, 64.0, 6)) // 64 single-dim slices
    def scanned(files: org.apache.spark.sql.DataFrame): Long =
      files.groupBy("f")
        .agg(min("x").as("nx"), max("x").as("xx"),
          min("y").as("ny"), max("y").as("xy"))
        .filter(col("nx") <= 24 && col("xx") >= 8 &&
          col("ny") <= 24 && col("xy") >= 8)
        .count()
    val (zScan, linScan) = (scanned(zFiles), scanned(linFiles))
    // the linear layout slices x only: every slice overlapping the x
    // range must be read regardless of y — z-order reads the 2D
    // neighborhood only
    assert(zScan < linScan,
      s"z-order scanned $zScan files, linear $linScan")
    // the [8,24]² box spans 8×8-cell quads 1..3 in each dim → 9 files
    assert(zScan <= 9, s"box should touch ≤9 z-files, got $zScan")
  }

  test("null and NaN pin to cell 0, never the top corner") {
    val out = Seq(Option(25.0), None, Option(Double.NaN))
      .toDF("v")
      .select(ZOrder.cell(col("v"), 0.0, 50.0, 3).as("c"))
      .as[Long].collect().toSeq
    // least/greatest SKIP nulls — an unguarded clamp would send null
    // to cell 7 (the max corner), poisoning that cell's min/max stats
    assert(out === Seq(4L, 0L, 0L))
  }

  test("zValue is deterministic and stable across evaluation") {
    val df = Seq((3.7, 91.2), (49.9, 0.1)).toDF("a", "b")
    val z = ZOrder.zValue(col("a"), 0.0, 50.0, col("b"), 0.0, 100.0, 5)
    val first = df.select(z.as("z")).as[Long].collect().toSeq
    val second = df.select(z.as("z")).as[Long].collect().toSeq
    assert(first === second)
    assert(first.forall(v => v >= 0 && v < (1L << 10)))
  }
}
