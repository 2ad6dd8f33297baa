package graft

/** Engine identity (reference: service/VersionService.scala:37-47,
  * model/Version.scala — the /khronus/version endpoint's payload). */
object Version {
  val AppName: String = "graft"
  val Number: String = "0.1.0"
  def json: String = s"""{"app":"$AppName","version":"$Number"}"""
}
