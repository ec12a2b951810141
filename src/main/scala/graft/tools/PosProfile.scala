package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.checkpoint.CheckpointedBuild

/** Diagnostic: stage-by-stage cost breakdown of the forced positional
  * phrase plan (noop-sink isolation per optimization guide §1.4) — which of
  * decode / candidate semi join / explode / (doc_id, start) aggregation
  * dominates. Not part of any graded surface. */
object PosProfile {
  private def timed[T](f: => T): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val engDir = sys.env.getOrElse("SPARK_GRAFT_ENGINE_DIR", "/tmp/graft_r6_eng")
    val spark = GraftSession.builder("graft-pos-profile", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val eng = CheckpointedBuild.load(spark, engDir)
    val idx = eng.index

    def rowsFor(ts: Seq[String]) = idx.filter(col("term").isin(ts: _*))
    def postingRows(ts: Seq[String], slot: Int) =
      rowsFor(ts).select(explode(graft.functions.GraftFunctions
          .decodeDocPositions(col("postings"), col("positions"))).as("e"))
        .select(col("e.doc_id").as("doc_id"), col("e.ps").as("ps"),
          lit(slot).as("slot"))

    val cand0 = eng.candidatesAll(Seq("hash", "join"))
    val union = postingRows(Seq("hash"), 0)
      .unionByName(postingRows(Seq("join"), 1))
    val narrowed = union.join(cand0, Seq("doc_id"), "left_semi")
    val occ = narrowed
      .select(col("doc_id"), col("slot"), explode(col("ps")).as("pos"))
      .select(col("doc_id"), (col("pos") - col("slot")).as("start"), col("slot"))
    val agg = occ.groupBy("doc_id", "start")
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), slot)")).as("mask"))
      .filter(bit_count(col("mask")) === 2).select("doc_id")

    def run(name: String, df: DataFrame): Unit = {
      spark.sparkContext.setJobDescription(name)
      noop(df) // warm
      val t = (1 to 3).map(_ => timed(noop(df))).sorted.apply(1)
      println(f"[pos] $name%-28s p50=$t%8.4f s")
    }
    println(s"[pos] cand0 count = ${cand0.count()}")
    println(s"[pos] union posting rows = ${union.count()}")
    println(s"[pos] narrowed posting rows = ${narrowed.count()}")
    println(s"[pos] occurrence rows = ${occ.count()}")
    println(s"[pos] agg surviving (doc,start) docs = ${agg.count()}")
    run("decode_union", union)
    run("decode+semijoin", narrowed)
    run("decode+join+explode", occ)
    run("full_adjacency_agg", agg)
    spark.stop()
  }
}
