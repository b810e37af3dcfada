package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one per suite, lazy). */
trait SparkTestBase extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestBase.session

  def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = GraftSession.build("graft-test", "local[4]", "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
