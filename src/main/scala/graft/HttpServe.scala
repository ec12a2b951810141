package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress

/** HTTP front over [[Serve.Session]] — the reference's flagship entry point
  * is a REST controller (`Backend/TextController.java:30-44`: query/page/
  * limit search plus a suggestion endpoint over one warm engine); this is
  * the same lifecycle on the JDK's built-in server (no new dependencies):
  *
  *   GET /search?query=Q[&page=P&limit=N] → JSON array of result rows
  *   GET /suggest?prefix=S                → JSON array of (query, cnt)
  *
  * Requests are handled on the dispatcher thread (executor null): the
  * session's engine is one warm Spark driver, so requests serialize onto it
  * exactly like the REPL front in [[Serve.main]]. */
object HttpServe {

  /** Start the front on `port` (0 = ephemeral); returns the bound server. */
  def start(session: Serve.Session, port: Int): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    def params(ex: HttpExchange): Map[String, String] =
      Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&").toSeq
        .filter(_.contains("=")).map { kv =>
          val Array(k, v) = kv.split("=", 2)
          k -> java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap
    def respond(ex: HttpExchange, code: Int, rows: Seq[String]): Unit = {
      val bytes = rows.mkString("[", ",", "]").getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    def route(path: String)(f: Map[String, String] => Seq[String]): Unit =
      server.createContext(path, (ex: HttpExchange) =>
        try respond(ex, 200, f(params(ex)))
        catch {
          case e: IllegalArgumentException =>
            respond(ex, 400, Seq(s"""{"error": ${Serve.jsonString(e.getMessage)}}"""))
          case e: Exception =>
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            respond(ex, 500, Seq(s"""{"error": ${Serve.jsonString(msg)}}"""))
        })
    route("/search") { p =>
      val q = p.getOrElse("query",
        throw new IllegalArgumentException("missing query parameter"))
      (p.get("page"), p.get("limit")) match {
        case (Some(pg), Some(lim)) => session.handle(s":page $pg $lim $q")
        case _                     => session.handle(q)
      }
    }
    route("/suggest") { p =>
      session.handle(":suggest " + p.getOrElse("prefix", ""))
    }
    server.start()
    server
  }

  /** args: <sfDir> [port] [ckptDir] — builds the checkpoint if not yet
    * published (resumable), then serves until the process is killed. */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val port = args.lift(1).map(_.toInt).getOrElse(8080)
    val ckptDir = args.lift(2).getOrElse(
      s"/tmp/graft_serve_v3_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}")
    val spark = GraftSession.builder("graft-http-serve",
      Runtime.getRuntime.availableProcessors()).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val files = corpus.Corpus.files(spark, sfDir)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$ckptDir/scalars.json")))
      checkpoint.CheckpointedBuild.run(files, ckptDir, nBuckets = 4)
    val session = new Serve.Session(spark, ckptDir, files, s"$ckptDir/querylog")
    val server = start(session, port)
    println(s"""{"status": "serving", "port": ${server.getAddress.getPort}, "n_docs": ${session.engine.nDocs}}""")
    Thread.currentThread().join() // serve until killed
  }
}
