package graft.tools

import graft.{GraftSession, IndexBuildJob}

/** Pre-seeds the shared size-keyed bench corpus caches at full parallelism.
  *
  * The corpus is untimed input setup, but without seeding the FIRST fork to
  * need a size pays its write at that fork's own parallelism — the local[1]
  * scaling-pair fork would synthesize the 1.92M-file corpus single-threaded
  * (~minutes of deadline budget burnt on setup, not measurement). Run this
  * once before a full Bench; all sizes land in the shared cache that
  * `IndexBuildJob.corpusOf` reads.
  *
  * Usage: CorpusSeed [sfDir] [targetFiles...] — defaults to the full-run
  * sizes (core-pair/lc warms, query corpus, core pair, lc pair).
  */
object CorpusSeed {
  def main(args: Array[String]): Unit = {
    val sfDir =
      args.headOption.getOrElse(
        sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val sizes: Seq[Long] =
      if (args.length > 1) args.drop(1).toSeq.map(_.toLong)
      else Seq(30000L, 60000L, 120000L, 480000L, 1920000L, 3840000L)
    val spark = GraftSession.builder("graft-corpus-seed",
      Runtime.getRuntime.availableProcessors()).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sizes.foreach { s =>
      val t0 = System.nanoTime()
      val (_, n) = IndexBuildJob.corpusOf(spark, sfDir, s)
      println(f"[seed] target=$s%8d -> corpus $n%8d files in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
