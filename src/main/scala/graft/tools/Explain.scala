package graft.tools

import graft.{Sessions, SparkEntry}

/** Plan iteration aid: print the formatted physical plan and a timed run
  * for the named queries (all queries if none named).
  * Usage: runMain graft.tools.Explain <sfDir> [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.local(appName = "graft-explain")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"===== $n =====")
      df.explain("formatted")
      val t0 = System.nanoTime()
      val c = df.count()
      println(f"$n: $c rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
