package graft

/** Debug utility: print the registry in Verify's iteration order (the
  * order `SparkEntry.queries` — a hash Map — happens to yield). The
  * driver's Verify run walks this exact order, so if its wall-clock
  * budget expires mid-run, the missing queries are a SUFFIX of this
  * list. Run: sbt "runMain graft.ListQueries". */
object ListQueries {
  def main(args: Array[String]): Unit = {
    val ks = SparkEntry.queries.keys.toSeq
    println(s"TOTAL=${ks.size}")
    ks.zipWithIndex.foreach { case (k, i) => println(f"$i%03d $k") }
  }
}
