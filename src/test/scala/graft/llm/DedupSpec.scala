package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup building blocks. The dfCap test is the scale guard for the
  * incremental-dedup corpus store: boilerplate shingles (appearing in more than
  * τ docs) must be pruned BEFORE any shingle equi-join, or a single hot key
  * fans the join out quadratically at corpus scale. */
class DedupSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("dfCap prunes boilerplate shingles but keeps rare ones") {
    import spark.implicits._
    // 20 docs sharing one license banner (boilerplate: df=20) plus one
    // distinctive sentence each (df=1 shingles)
    val banner = "licensed under the apache license version two point zero"
    val docs = (0 until 20)
      .map(i => (i.toLong, s"$banner document number $i talks about topic $i"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingleFrame(docs, "doc_id", "text", 3)
    val capped = Dedup.dfCap(sh, tau = 5L)
    val bannerShingle = "licensed under the"
    assert(sh.filter($"shingle" === bannerShingle).count() == 20)
    // every banner-only shingle (df=20 > 5) is gone...
    assert(capped.filter($"shingle" === bannerShingle).count() == 0)
    assert(capped.filter($"shingle" === "under the apache").count() == 0)
    // ...while per-doc distinctive shingles (df=1) survive for every doc
    assert(capped.filter($"shingle" === "about topic 7").count() == 1)
    assert(capped.select($"doc_id").distinct().count() == 20)
    // the cap is a pure filter: kept rows are a subset of the input
    assert(capped.count() < sh.count())
    assert(capped.join(sh, Seq("doc_id", "shingle"), "left_anti").count() == 0)
  }

  test("bandedCandidatesWide maxBucket drops oversized buckets, keeps the rest") {
    import spark.implicits._
    // 12 exact copies of one text (a 12-member bucket in EVERY band) plus two
    // near-identical outliers that pair only with each other
    val docs = ((0 until 12).map(i => (i.toLong, "alpha beta gamma delta epsilon zeta eta")) ++
      Seq((100L, "one two three four five six seven eight nine"),
        (101L, "one two three four five six seven eight nine")))
      .toDF("doc_id", "text")
    val sh = Dedup.shingleFrame(docs, "doc_id", "text", 3)
    val wide = Dedup.minhashWide(sh, "doc_id", numHashes = 8)
    val plain = Dedup.bandedCandidatesWide(wide, "doc_id", 8, 2)
    val capped = Dedup.bandedCandidatesWide(wide, "doc_id", 8, 2, maxBucket = Some(5))
    // uncapped: the 12-clone group alone yields C(12,2)=66 pairs
    assert(plain.count() >= 66 + 1)
    assert(plain.filter($"id1" === 100 && $"id2" === 101).count() == 1)
    // capped: the hot bucket's 66 pairs are gone, the small pair survives
    val cap = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cap.contains((100L, 101L)))
    assert(!cap.exists { case (a, b) => a < 12 && b < 12 })
    // the cap only removes pairs — never invents them
    assert(capped.join(plain, Seq("id1", "id2"), "left_anti").count() == 0)
  }

  test("CappedCollect.long: complete below the limit, truncated at it") {
    import spark.implicits._
    // 3 groups over 8 input partitions so partial-merge paths are exercised:
    // g=0 has 4 members (< limit ⇒ complete set), g=1 has 12 (⇒ exactly
    // `limit` survive), g=2 has 1
    val df = ((0 until 4).map(i => (0L, i.toLong)) ++
      (0 until 12).map(i => (1L, 100L + i)) ++ Seq((2L, 7L)))
      .toDF("g", "v").repartition(8)
    val got = df.groupBy($"g")
      .agg(graft.functions.CappedCollect.long($"v", 5).as("ms"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(got(0L).toSet == (0 until 4).map(_.toLong).toSet)
    assert(got(1L).length == 5 &&
      got(1L).forall(v => v >= 100L && v < 112L))
    assert(got(2L) == Seq(7L))
  }

  test("dfCap at tau >= max df is the identity") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingleFrame(docs, "doc_id", "text", 3)
    assert(Dedup.dfCap(sh, tau = 2L).count() == sh.count())
  }
}
