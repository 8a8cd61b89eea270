package graft.engine

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The small driver-side surfaces the reference leans on for inspection —
  * `df.sample(...)` (`/root/reference/03_aml_entity_resolution.py:59`) and
  * `take(n)`/`limit(n)` (`:94`) — covered here because they are not
  * SQL-oracle-expressible (sampling RNGs differ per engine; take is
  * driver-side).
  */
class DriverSurfaceSpec extends SparkTestBase {
  import spark.implicits._

  // spark.range gives a genuinely distributed source — a local Seq would
  // plan as LocalTableScan and Catalyst would collapse the limit entirely
  private lazy val df = spark.range(1L, 10001L).toDF("id")

  test("sample(fraction, seed) is deterministic for a fixed seed and approximates the fraction") {
    val a = df.sample(0.1, seed = 7).as[Long].collect().toSeq
    val b = df.sample(0.1, seed = 7).as[Long].collect().toSeq
    assert(a == b, "same seed must produce the identical sample")
    // Bernoulli sampling: expect ~1000 rows; 4-sigma tolerance
    assert(a.size > 850 && a.size < 1150, s"sample size ${a.size} far from 10%")
    val c = df.sample(0.1, seed = 8).as[Long].collect().toSeq
    assert(a != c, "different seeds should produce different samples")
  }

  test("sample runs distributed (Sample operator in-plan, no collect)") {
    val plan = df.sample(0.1, seed = 7).queryExecution.explainString(FormattedMode)
    assert(plan.contains("Sample"), s"expected a Sample physical operator:\n$plan")
  }

  test("take(n) and limit(n) return exactly n rows via CollectLimit, not a full scan collect") {
    assert(df.orderBy("id").take(3).map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(df.limit(5).count() == 5L)
    val plan = df.limit(5).queryExecution.executedPlan.toString
    assert(plan.contains("CollectLimit") || plan.contains("GlobalLimit"),
      s"limit must plan as a limit operator:\n$plan")
  }

  test("head and isEmpty short-circuit without scanning everything") {
    assert(df.head().getLong(0) == 1L)
    assert(!df.isEmpty && spark.emptyDataFrame.isEmpty)
  }

  test("na.drop removes rows with nulls in the watched columns only") {
    import spark.implicits._
    val d = Seq((1L, Some("a"), Some(1.0)), (2L, None, Some(2.0)),
      (3L, Some("c"), None)).toDF("id", "s", "x")
    assert(d.na.drop().count() == 1)
    assert(d.na.drop(Seq("s")).select("id").as[Long].collect().toSet == Set(1L, 3L))
    assert(d.na.drop("all").count() == 3) // no all-null rows
  }
}
