package graft

/** Plan-audit entry point: prints the formatted physical plan for one,
  * several (comma-separated), or all registered queries. Usage:
  *   runMain graft.Explain <sfDir> [queryName[,queryName...]]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).headOption.map(_.split(",").toSet)
    val spark = graft.core.Graft.session("local[8]", shufflePartitions = 8)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.forall(_.contains(name))) {
        println(s"\n================ $name ================")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
