package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (getOrCreate: one JVM, one session). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  implicit lazy val implicitSpark: SparkSession = spark

  /** Flatten an exception's cause chain to its messages — Spark wraps user
    * failures several layers deep, and which layer carries the interesting
    * text varies by execution path. */
  protected def messages(t: Throwable): Seq[String] =
    if (t == null) Nil else String.valueOf(t.getMessage) +: messages(t.getCause)
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = Sessions.local("graft-test")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
