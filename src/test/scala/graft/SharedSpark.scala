package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.{BeforeAndAfterAll, Suite}

/** One local session shared across a suite (and, via getOrCreate, across
  * suites in the same JVM — sbt forks one test JVM).
  */
trait SharedSpark extends BeforeAndAfterAll { self: Suite =>
  lazy val spark: SparkSession = GraftSession.local(cores = 4, shufflePartitions = 4)

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
