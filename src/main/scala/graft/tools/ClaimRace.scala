package graft.tools

/** Subprocess half of the cross-process commit-arbiter race test
  * (CdcSpec "two separate JVMs race"): wait for the go-file gate so both
  * racers hit the arbiter simultaneously, then claim every key and
  * report per-key outcomes. Deliberately Spark-free — the JVM boots in
  * ~100 ms off the test classpath, so the race window is real.
  *
  * args: claimDir goFile payloadTag key1 [key2 ...]
  * stdout: one `CLAIM <key> <won>` line per key.
  */
object ClaimRace {
  def main(args: Array[String]): Unit = {
    val claimDir = args(0)
    val goFile = args(1)
    val tag = args(2)
    val keys = args.drop(3)
    val arbiter = new graft.table.ClaimFileArbiter(claimDir)
    val deadline = System.currentTimeMillis() + 30000
    while (!new java.io.File(goFile).exists()) {
      if (System.currentTimeMillis() > deadline) sys.exit(3)
      Thread.sleep(1)
    }
    keys.foreach { k =>
      val won = arbiter.claim(k, s"$tag:$k".getBytes("UTF-8"))
      println(s"CLAIM $k $won")
    }
  }
}
