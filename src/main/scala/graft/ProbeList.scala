package graft
object ProbeList {
  def main(args: Array[String]): Unit =
    SparkEntry.queries.keys.toSeq.sorted.foreach(q => println(s"QLIST $q"))
}
