package graft.functions

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{AnalysisException, DataFrame}
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.engine.Sources

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  private def zv(vals: Long*): Long =
    Seq(Tuple1(1)).toDF("one")
      .select(call_function("z_value", vals.map(lit): _*).as("z"))
      .as[Long].head()

  test("z_value matches the LSB-first column-major bit contract") {
    // n=2: bit b of col0 -> 2b, col1 -> 2b+1
    assert(zv(0L, 0L) == 0L)
    assert(zv(1L, 0L) == 1L)
    assert(zv(0L, 1L) == 2L)
    assert(zv(1L, 1L) == 3L)
    assert(zv(2L, 0L) == 4L)
    assert(zv(3L, 5L) == ((1L) | (1L << 1) | (1L << 2) | (1L << 5)))
    // n=3: bit b of col j -> 3b + j
    assert(zv(1L, 1L, 1L) == 7L)
    assert(zv(0L, 0L, 2L) == (1L << 5))
    // reference re-implementation over random coordinates
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val a = rnd.nextLong().abs % (1L << 31)
      val b = rnd.nextLong().abs % (1L << 31)
      val expect = (0 until 31).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
      assert(zv(a, b) == expect, s"z($a, $b)")
    }
  }

  test("z-order is monotone within a quadrant (locality smoke)") {
    // points inside one power-of-two box share their high z bits: codes of
    // [0,4)x[0,4) all sort below any point with a coordinate >= 4
    val inside = for (a <- 0L until 4L; b <- 0L until 4L) yield zv(a, b)
    assert(inside.max < zv(4L, 0L) && inside.max < zv(0L, 4L))
  }

  test("nulls propagate; out-of-range and non-integral inputs are errors") {
    val df = Seq((Some(1L), 2L), (None, 3L)).toDF("a", "b")
    val got = df.select(call_function("z_value", col("a"), col("b")).as("z"))
      .as[Option[Long]].collect().toSet
    assert(got == Set(Some(zv(1L, 2L)), None))
    // foldable literals surface the error at constant-folding time
    // (driver, unwrapped); column inputs at execution time (wrapped) —
    // accept either, require the z_value message
    val e = intercept[Exception] {
      Seq((-1L, 0L)).toDF("a", "b")
        .select(call_function("z_value", col("a") * 1L, col("b"))).collect()
    }
    assert(Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .take(4).exists(_.getMessage.contains("z_value")))
    intercept[AnalysisException] {
      Seq(("x", 1L)).toDF("a", "b")
        .select(call_function("z_value", col("a"), col("b"))).collect()
    }
    intercept[AnalysisException] {
      Seq(Tuple1(1L)).toDF("a")
        .select(call_function("z_value", col("a"))).collect()
    }
  }

  /** Per-file (min, max) of an int64 column across a parquet directory,
    * read straight from the footers — what a scan's row-group pruning
    * sees. Files written by this spec hold one row group each. */
  private def footerSpans(dir: String, column: String): Seq[(Long, Long)] = {
    val conf = new Configuration()
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.length() > 0)
      .toSeq.flatMap { f =>
        val rd = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
        try rd.getFooter.getBlocks.asScala.toSeq.map { block =>
          val st = block.getColumns.asScala
            .find(_.getPath.toDotString == column).get.getStatistics
          (st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
            st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
        } finally rd.close()
      }
  }

  private def avgSpan(spans: Seq[(Long, Long)]): Double =
    spans.map { case (lo, hi) => (hi - lo).toDouble }.sum / spans.size

  test("zOrderLayout bounds footer min/max spans on BOTH dimensions") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1992-01-01")))
          .cast("long").as("o_day"))
    val bins = 1024
    val binned = orders
      .withColumn("ck_bin", Sources.widthBucket(orders, col("o_custkey"), bins))
      .withColumn("day_bin", Sources.widthBucket(orders, col("o_day"), bins))

    val tmp = Files.createTempDirectory("zorder").toFile.getAbsolutePath
    val zDir = s"$tmp/z"
    val sortDir = s"$tmp/sorted"
    Sources.zOrderLayout(binned, Seq(col("ck_bin"), col("day_bin")), 16)
      .write.mode("overwrite").parquet(zDir)
    // contrast: lexicographic single-sort layout — perfect on the leading
    // dimension, unconstrained on the second
    binned.repartitionByRange(16, col("ck_bin"))
      .sortWithinPartitions(col("ck_bin"))
      .write.mode("overwrite").parquet(sortDir)

    def spans(dir: String, c: String) = footerSpans(dir, c)
    val global = avgSpan(Seq((
      binned.agg(min("ck_bin")).head().getLong(0),
      binned.agg(max("ck_bin")).head().getLong(0))))
    val globalDay = avgSpan(Seq((
      binned.agg(min("day_bin")).head().getLong(0),
      binned.agg(max("day_bin")).head().getLong(0))))

    val zCk = avgSpan(spans(zDir, "ck_bin"))
    val zDay = avgSpan(spans(zDir, "day_bin"))
    val sCk = avgSpan(spans(sortDir, "ck_bin"))
    val sDay = avgSpan(spans(sortDir, "day_bin"))

    // z-layout: every file covers a bounded rectangle — both dims well
    // under the global span (16 files ~ 4x4 grid -> ~0.25-0.5 each; allow
    // slack for range-boundary straddle)
    assert(zCk < 0.7 * global, s"z ck span $zCk vs global $global")
    assert(zDay < 0.7 * globalDay, s"z day span $zDay vs global $globalDay")
    // single-sort: leading dim tight, second dim ~the whole range
    assert(sCk < 0.3 * global, s"sorted ck span $sCk vs global $global")
    assert(sDay > 0.8 * globalDay, s"sorted day span $sDay vs global $globalDay")
    // and the z files stay competitive with the single-sort layout's
    // leading dim to within the sqrt tradeoff, not degenerate
    assert(zCk < globalDay, "z layout degenerate on ck")

    // correctness unchanged by layout: same rows back
    val roundTrip = spark.read.parquet(zDir)
    assert(roundTrip.count() == binned.count())
    assert(roundTrip.agg(sum("o_orderkey")).head().getLong(0) ==
      binned.agg(sum("o_orderkey")).head().getLong(0))

    // executable skipping proof: a predicate on the NON-leading dimension
    // row-group-prunes the z layout but scans ~everything in the
    // single-sort layout. Scan numOutputRows = rows surviving parquet
    // stats-based skipping (the residual filter re-runs above the scan),
    // so it measures exactly the skipping the footers promise.
    def scannedRows(dir: String): Long = {
      val q = spark.read.parquet(dir)
        .filter(col("day_bin") >= 0L && col("day_bin") < lit(bins / 8L))
      q.collect()
      val leaf = q.queryExecution.executedPlan.collectLeaves().head
      leaf.metrics("numOutputRows").value
    }
    val zScanned = scannedRows(zDir)
    val sScanned = scannedRows(sortDir)
    val total = binned.count()
    assert(sScanned > (total * 0.9).toLong,
      s"sorted layout should scan ~all rows for a day-only predicate, got $sScanned/$total")
    assert(zScanned < (total * 0.6).toLong,
      s"z layout should row-group-skip most rows, got $zScanned/$total")
  }
}
