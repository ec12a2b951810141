package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** Property test for the streaming doc-grouped adjacency check (r6 — the
  * replacement for the (doc_id, start) bit-mask aggregation): against a
  * brute-force "∃ start: ∀ slot i, start + i occupied" oracle on random
  * slot/position layouts. */
class AdjacentDocsSpec extends AnyFunSuite {

  private def brute(perDoc: Map[Long, Seq[(Int, Array[Int])]], n: Int): Set[Long] =
    perDoc.collect { case (doc, rows) =>
      val slotPos = (0 until n).map(i =>
        rows.filter(_._1 == i).flatMap(_._2).toSet)
      val starts = slotPos.head.flatMap(p => Some(p)).filter(s =>
        (0 until n).forall(i => slotPos(i).contains(s + i)))
      if (starts.nonEmpty) Some(doc) else None
    }.flatten.toSet

  test("adjacentDocs == brute-force start check on random layouts") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 50) {
      val n = 2 + rnd.nextInt(3) // 2-4 slots
      val docs = (0L until 30L).map { d =>
        val rows = (0 until n).flatMap { slot =>
          // some slots empty, some with several postings (expansion terms)
          (0 until rnd.nextInt(3)).map { _ =>
            val ps = Array.fill(1 + rnd.nextInt(5))(rnd.nextInt(12)).distinct.sorted
            (slot, ps)
          }
        }
        d -> rows
      }.toMap
      // sorted by doc_id, slot order within doc shuffled
      val flat = docs.toSeq.sortBy(_._1).flatMap { case (d, rows) =>
        rnd.shuffle(rows).map { case (s, ps) => (d, s, ps) }
      }
      val got = CompressedSearchEngine.adjacentDocs(flat.iterator, n).toSet
      val want = brute(docs, n)
      assert(got === want, s"trial $trial n=$n")
    }
  }

  test("adjacentDocs: empty input, single slot, missing slot") {
    assert(CompressedSearchEngine.adjacentDocs(Iterator.empty, 2).toSeq === Seq())
    // single-slot phrase: any occurrence is a match
    assert(CompressedSearchEngine.adjacentDocs(
      Iterator((5L, 0, Array(3))), 1).toSeq === Seq(5L))
    // slot 1 missing entirely
    assert(CompressedSearchEngine.adjacentDocs(
      Iterator((5L, 0, Array(3))), 2).toSeq === Seq())
  }
}
