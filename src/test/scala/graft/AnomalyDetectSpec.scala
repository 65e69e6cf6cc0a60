package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.AnomalyDetect

/** Stream-static anomaly detection: windowed hourly counts scored
  * against a batch-trained baseline with the same integer z-test as
  * the batch q39 gate — a spiked hour flags, normal hours don't, and
  * the decision matches the straight-line predicate exactly.
  */
class AnomalyDetectSpec extends AnyFunSuite {

  final case class Ev(ts: Timestamp, event_type: String)

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(minutes: Long): Timestamp =
    new Timestamp(1700000000000L / 3600000L * 3600000L + minutes * 60000L)

  test("spiked hour flags against the static baseline; quiet hours pass") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // baseline: 10 hours averaging 4 events/hour with small jitter ->
    // n=10, sx=40, sq=162 for type "click"
    val base = Seq(4L, 4L, 4L, 4L, 4L, 3L, 5L, 4L, 4L, 4L)
    val stats = Seq(("click", base.length.toLong, base.sum,
      base.map(x => x * x).sum)).toDF("event_type", "n", "sx", "sq")

    val input = MemoryStream[Ev]
    val query = AnomalyDetect.flags(input.toDF(), stats,
        watermarkDelay = "30 minutes")
      .writeStream.format("memory").queryName("anom")
      .outputMode("append").start()
    try {
      // hour 0: a 40-event spike; hour 1: a normal 4-event hour
      input.addData((1 to 40).map(i => Ev(ts(i % 60), "click")))
      input.addData(Seq(Ev(ts(65), "click"), Ev(ts(70), "click"),
        Ev(ts(80), "click"), Ev(ts(90), "click")))
      query.processAllAvailable()
      // advance the watermark far past both hours so they finalize
      input.addData(Seq(Ev(ts(60 * 5), "click")))
      query.processAllAvailable()

      val rows = spark.table("anom").collect()
        .map(r => (r.getAs[Timestamp]("h"), r.getAs[Long]("x"),
          r.getAs[Boolean]("spike")))
      // straight-line predicate on the same baseline
      val (n, sx, sq) = (base.length.toLong, base.sum, base.map(x => x * x).sum)
      def anomalous(x: Long): Boolean = {
        val dev = n * x - sx; dev * dev > 4L * (n * sq - sx * sx)
      }
      assert(anomalous(40L) && !anomalous(4L)) // the test data discriminates
      assert(rows.count(_._2 == 40L) == 1)     // spiked hour emitted
      rows.foreach { case (_, x, spike) =>
        assert(anomalous(x), s"non-anomalous hour (x=$x) emitted")
        assert(spike == (n * x - sx > 0))
      }
      assert(!rows.exists(_._2 == 4L), "normal hour must not flag")
    } finally query.stop()
  }
}
