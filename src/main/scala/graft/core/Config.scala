package graft.core

import java.io.File

import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization.read

import scala.io.Source

/** Engine settings loaded from a JSON file (reference:
  * Config.scala:22-30 — same shape, with the AWS/MySQL connection
  * blocks replaced by filesystem roots and Spark settings; json4s
  * ships with Spark, no extra dependency).
  */
final case class Config(
    project: String,
    inputRoot: String,
    outputRoot: String,
    runsRoot: Option[String] = None,
    shufflePartitions: Option[Int] = None
) {
  def resolvedRunsRoot: String = runsRoot.getOrElse(s"$outputRoot/.graft")
}

object Config {
  implicit val formats: Formats = DefaultFormats

  /** Load and parse the settings file. */
  def load(file: File): Config = {
    val source = Source.fromFile(file)
    try read[Config](source.mkString)
    finally source.close()
  }

  def parse(json: String): Config = read[Config](json)
}
