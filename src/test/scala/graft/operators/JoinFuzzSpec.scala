package graft.operators

import scala.util.Random
import graft.SparkSpec
import graft.operators.join.RangeJoin
import graft.operators.pack.Curriculum

/** Randomized equivalence: the bucketized joins and the curriculum
  * stage assignment must reproduce their naive reference computations
  * on arbitrary inputs (fixed seeds — failures replay exactly).
  */
class JoinFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("intervalOverlap equals the naive all-pairs filter on random spans") {
    val rnd = new Random(4242)
    for (round <- 1 to 3) {
      // spans may be empty, inverted, negative, or bucket-straddling
      val ls = (1 to 60).map { i =>
        val s = rnd.nextInt(400) - 200L
        (i.toLong, s, s + rnd.nextInt(60) - 5L)
      }
      val rs = (1 to 40).map { i =>
        val s = rnd.nextInt(400) - 200L
        (i.toLong, s, s + rnd.nextInt(90) - 5L)
      }
      val naive = (for {
        (li, lsv, lev) <- ls if lev > lsv
        (ri, rsv, rev) <- rs if rev > rsv
        if lsv < rev && rsv < lev
      } yield (li, ri)).toSet
      val bucket = 1L + rnd.nextInt(50)
      val got = RangeJoin.intervalOverlap(
          ls.toDF("lid", "ls", "le"), "ls", "le",
          rs.toDF("rid", "rs", "re"), "rs", "re", bucket)
        .select("lid", "rid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size,
        s"round $round bucket $bucket produced duplicates")
      assert(got.toSet == naive, s"round $round bucket $bucket diverged")
    }
  }

  test("curriculum stages equal the brute-force rank formula on random scores") {
    val rnd = new Random(77)
    for (round <- 1 to 3) {
      val stages = 2 + rnd.nextInt(6)
      val rows = (1 to 200).map(i => (i.toLong, rnd.nextInt(25).toLong))
      val n = rows.size
      // reference: 0-based rank of the value's first occurrence in the
      // sorted multiset, scaled to stages
      val sorted = rows.map(_._2).sorted
      val firstRank = sorted.distinct.map(v => v -> sorted.indexOf(v)).toMap
      val want = rows.map { case (id, v) =>
        id -> (firstRank(v).toLong * stages / n)
      }.toMap
      val got = Curriculum.order(rows.toDF("id", "score"), "id", "score",
          stages, 4)
        .select("id", "stage").as[(Long, Long)].collect().toMap
      assert(got == want, s"round $round stages $stages diverged")
    }
  }
}
