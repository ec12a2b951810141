package graft

import graft.corpus.Corpus
import java.nio.file.Files

class ServeSpec extends SparkSpec {

  test("serving session: warm engine answers queries, pages, suggestions") {
    val dir = Files.createTempDirectory("graft-serve").toString
    val files = Corpus.files(spark, "/root/testdata/sf0.001")
    checkpoint.CheckpointedBuild.run(files, dir, nBuckets = 2)
    val s = new Serve.Session(spark, dir, files, s"$dir/querylog")
    try {
      val hits = s.handle("merge sort window")
      assert(hits.size === 10)
      assert(hits.forall(j => j.contains("\"doc_id\"") && j.contains("\"score\"")
        && j.contains("\"path\"")))
      // pagination: page 2 of 3 == rows 4-6 of the same ranking
      val all = s.handle("merge sort window")
      val p2 = s.handle(":page 2 3 merge sort window")
      assert(p2 === all.slice(3, 6))
      // phrase + boolean forms route through the same parser as the engine
      assert(s.handle("\"hash join\"").nonEmpty)
      // the session's queries accumulated in the log → suggestions see them
      val sug = s.handle(":suggest merge")
      assert(sug.exists(_.contains("merge sort window")))
      // the repeated query outranks the once-asked ones
      assert(sug.head.contains("\"cnt\":3"))
      assert(s.handle("") === Seq.empty)
      assert(s.handle(":page x") === Seq("""{"error": "usage: :page <p> <n> <query>"}"""))

      // HTTP front (reference TextController lifecycle): one GET /search
      // round-trip against the same warm session, ephemeral port
      val server = HttpServe.start(s, 0)
      try {
        def get(pathQ: String): String = {
          val url = java.net.URI.create(
            s"http://127.0.0.1:${server.getAddress.getPort}$pathQ").toURL
          val src = scala.io.Source.fromInputStream(url.openStream(), "UTF-8")
          try src.mkString finally src.close()
        }
        val body = get("/search?query=merge+sort+window")
        assert(body.startsWith("[") && body.endsWith("]"))
        assert(body.split("\\{\"doc_id\"").length - 1 === 10)
        val paged = get("/search?query=merge+sort+window&page=2&limit=3")
        assert(paged === "[" + all.slice(3, 6).mkString(",") + "]")
        val sugBody = get("/suggest?prefix=merge")
        assert(sugBody.contains("merge sort window"))
        def status(pathQ: String): Int = java.net.URI.create(
          s"http://127.0.0.1:${server.getAddress.getPort}$pathQ").toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
          .getResponseCode
        // a malformed request is a JSON error, not a dead socket
        assert(status("/search") === 400)
        // pagination params come together: a lone page (or limit) is a 400,
        // not page-1 rows silently returned for a page-3 request
        assert(status("/search?query=merge+sort&page=3") === 400)
        assert(status("/search?query=merge+sort&limit=5") === 400)
        assert(status("/search?query=merge+sort&page=x&limit=3") === 400)
        // a query that happens to start with a REPL command is searched
        // literally, never re-parsed by the line-protocol dispatcher
        val inj = get("/search?query=%3Asuggest+merge")
        assert(inj.startsWith("[") && !inj.contains("\"cnt\":"))
      } finally server.stop(0)
    } finally s.close()
  }
}
