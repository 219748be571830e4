package graft

import org.apache.spark.sql.{SQLContext, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for the test suite (one per JVM; the forked
  * test JVM is configured in build.sbt). */
object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession.builder("local[4]", Some(4))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  implicit lazy val sqlContext: SQLContext = spark.sqlContext
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
  val sf0001 = "/root/testdata/sf0.001"
}
