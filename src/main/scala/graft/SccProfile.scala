package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Repo tooling: job/stage/task census of one warm q60 run — where does a
  * 0.45 s propagation round actually go (job wall vs inter-job driver
  * gaps)? Run: `sbt "runMain graft.SccProfile"`. */
object SccProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.toSeq.filter(_.startsWith("conf:")).foreach { a =>
      a.stripPrefix("conf:").split(",").foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      }
    }
    val jobs = mutable.ArrayBuffer[(Int, Long, Long)]()
    val starts = mutable.Map[Int, Long]()
    var stages = 0
    var tasks = 0
    var taskMs = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = j.time
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs += ((j.jobId, starts.getOrElse(j.jobId, j.time), j.time))
      override def onStageCompleted(st: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += st.stageInfo.numTasks
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) taskMs += t.taskInfo.duration
    }
    def runq(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries("q60_scc")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    runq() // warm
    spark.sparkContext.addSparkListener(listener)
    val wall = runq()
    Thread.sleep(800)
    println(f"WALL=$wall%.2f jobs=${jobs.size} stages=$stages tasks=$tasks taskMs=$taskMs")
    val durs = jobs.map(j => j._3 - j._2).sorted
    println(s"sum job wall ms=${durs.sum} median=${if (durs.nonEmpty) durs(durs.size / 2) else 0} max=${durs.lastOption.getOrElse(0L)}")
    val sorted = jobs.sortBy(_._2)
    val gaps = sorted.sliding(2).collect { case mutable.ArrayBuffer(a, b) => b._2 - a._3 }.toSeq
    println(s"sum inter-job gap ms=${gaps.filter(_ > 0).sum} gaps>50ms=${gaps.count(_ > 50)} maxgap=${gaps.maxOption.getOrElse(0L)}")
    spark.stop()
  }
}
