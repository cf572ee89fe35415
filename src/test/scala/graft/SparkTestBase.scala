package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite (UTC, small shuffle width). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = Graft.session(cores = 8, appName = getClass.getSimpleName)

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
