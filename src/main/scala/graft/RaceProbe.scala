package graft

/** Two-process warehouse race probe (devtools/racecheck.py spawns two
  * of these against one cold key): runs a deliberately slow
  * [[graft.ops.Warehouse.getOrBuild]] so both JVMs are in-flight
  * simultaneously and the loser exercises the cross-process rename
  * adoption path (Warehouse ENOTEMPTY handling) for real — the
  * in-process WarehouseSpec race cannot produce two distinct PIDs.
  * Prints one parseable line; the harness asserts both processes land
  * on the same completed artifact with exactly one builder. No
  * SparkSession — the warehouse protocol is pure filesystem. */
object RaceProbe {
  def main(args: Array[String]): Unit = {
    val ds = args(0)
    var bStart = 0L
    var bEnd = 0L
    val dir = ops.Warehouse.getOrBuild("race2p", ds, "documents.parquet") { tmp =>
      bStart = System.currentTimeMillis()
      java.nio.file.Files.createDirectories(tmp)
      Thread.sleep(2000) // hold the build open so the processes overlap
      java.nio.file.Files.write(tmp.resolve("data.bin"), Array[Byte](1, 2, 3))
      bEnd = System.currentTimeMillis()
      ()
    }
    // the build window lets the harness PROVE the two processes were
    // in-flight simultaneously — a fast-path reuse (manifest already
    // complete) reports 0/0 and the harness retries the round
    println(s"RACE_RESULT pid=${ProcessHandle.current.pid} dir=$dir " +
      s"built=${ops.Warehouse.buildsRun.get()} start=$bStart end=$bEnd")
  }
}
