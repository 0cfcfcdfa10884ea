package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared Spark test harness: one local session per suite. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  val sf: String = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // session shared across suites — do not stop
    super.afterAll()
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .appName("graft-test")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      // mirror Session.build: catalog-table suites (Scale/Plan) must not
      // land ./spark-warehouse in the repo working tree; unique per run
      // so parallel sbt JVMs never share bucketed tables
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_test_warehouse_${java.util.UUID.randomUUID().toString.take(8)}")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
