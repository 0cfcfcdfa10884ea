package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Scratch: does Dataset.localCheckpoint's eager materialization job
  * complete an Observation? (Throwaway — deleted before commit.)
  */
class ScratchObsSpec extends SparkSpec {
  import spark.implicits._

  test("observe metrics are available after eager localCheckpoint") {
    val obs = Observation("scratch_fp")
    val df = spark.range(1000).toDF("u")
      .withColumn("v", $"u" % 7)
      .observe(obs, count(lit(1)).as("cnt"),
        coalesce(sum(xxhash64($"u", $"v").cast("decimal(38,0)")), lit(0)).as("hs"))
      .localCheckpoint()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val m2 = Await.result(Future(obs.get), 10.seconds)
    info(s"observation after checkpoint: $m2")
    assert(m2.nonEmpty, "observation never completed")
    assert(m2("cnt") == 1000L)
    assert(df.count() == 1000L)
  }
}
