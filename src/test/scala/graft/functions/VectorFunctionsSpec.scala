package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorFunctionsSpec extends AnyFunSuite {

  private lazy val spark = {
    // getOrCreate may return a session created by another suite in this JVM,
    // in which case .withExtensions is silently ignored — register explicitly.
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    VectorFunctions.register(s)
    s
  }

  private val sf = "/root/testdata/sf0.001"

  test("vec_dot matches the decimal-exact HOF formulation to 1e-9") {
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, sf).limit(50).cache()
    val a = e.select($"vec_id".as("id1"), $"embedding".as("e1"))
    val b = e.select($"vec_id".as("id2"), $"embedding".as("e2"))
    val pairs = a.join(b, $"id1" < $"id2")
      .select(
        VectorFunctions.vec_dot($"e1", $"e2").as("fast"),
        graft.llm.Similarity.dotExact($"e1", $"e2").as("exact"))
    val maxDiff = pairs.agg(max(abs($"fast" - $"exact"))).head().getDouble(0)
    assert(maxDiff < 1e-9, s"maxDiff=$maxDiff")
  }

  test("vec_dot_exact is BIT-IDENTICAL to the decimal HOF formulation") {
    import spark.implicits._
    // real embeddings: every pair must match exactly, not to a tolerance —
    // the oracle gate hashes these doubles
    val e = graft.Tables.embeddings(spark, sf).limit(80).cache()
    val a = e.select($"vec_id".as("id1"), $"embedding".as("e1"))
    val b = e.select($"vec_id".as("id2"), $"embedding".as("e2"))
    val bad = a.join(b, $"id1" < $"id2")
      .select(
        graft.llm.Similarity.dotExact($"e1", $"e2").as("native"),
        graft.llm.Similarity.dotExactHof($"e1", $"e2").as("hof"))
      .filter(!($"native" === $"hof")) // bitwise: NaN-free doubles
      .count()
    assert(bad == 0, s"$bad pairs diverge from the HOF formulation")
  }

  test("vec_dot_exact adversarial values: negatives, tiny, large, rounding edges") {
    import spark.implicits._
    val vs = Seq(
      (Array(-1.5f, 2.25f, -3.125f), Array(4.0f, -5.5f, 6.75f)),
      (Array(1e-8f, -1e-8f, 1e8f), Array(1e-8f, 1e-8f, 1e8f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.7f, 0.8f, 0.9f)),
      (Array(Float.MinPositiveValue, 1f), Array(Float.MinPositiveValue, 1f)))
    val df = vs.toDF("a", "b")
    val rows = df.select(
      graft.llm.Similarity.dotExact($"a", $"b").as("native"),
      graft.llm.Similarity.dotExactHof($"a", $"b").as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r.toString)
    }
  }

  test("vec_dot_exact null semantics: null array, null element, length mismatch") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(Some(1.0f), Some(2.0f))), Some(Seq(Some(3.0f)))), // length mismatch
      (Some(Seq(Some(1.0f), None)), Some(Seq(Some(3.0f), Some(4.0f)))), // null elem
      (None, Some(Seq(Some(1.0f)))) // null array
    ).toDF("a", "b")
      .select($"a".cast("array<float>"), $"b".cast("array<float>"))
    val got = df.select(
      graft.llm.Similarity.dotExact($"a", $"b").as("native"),
      graft.llm.Similarity.dotExactHof($"a", $"b").as("hof")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) && r.isNullAt(1), r.toString)
    }
  }

  /** The HOF specification VecL2Exact must reproduce bit-for-bit. */
  private def l2ExactHof(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val DEC = org.apache.spark.sql.types.DataTypes.createDecimalType(30, 12)
    aggregate(
      zip_with(a, b, (x, y) =>
        ((x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))).cast(DEC)),
      lit(0).cast(DEC),
      (acc, x) => (acc + x).cast(DEC)
    ).cast("double")
  }

  test("vec_l2_exact is BIT-IDENTICAL to the decimal HOF on float embeddings") {
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, sf).limit(80).cache()
    val a = e.select($"vec_id".as("id1"), $"embedding".as("e1"))
    val b = e.select($"vec_id".as("id2"), $"embedding".as("e2"))
    val bad = a.join(b, $"id1" < $"id2")
      .select(
        VectorFunctions.vec_l2_exact($"e1", $"e2").as("native"),
        l2ExactHof($"e1", $"e2").as("hof"))
      .filter(!($"native" === $"hof")).count()
    assert(bad == 0, s"$bad pairs diverge from the HOF formulation")
  }

  test("vec_l2_exact double and mixed float/double arrays match the HOF") {
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, sf).limit(40).cache()
    val a = e.select($"vec_id".as("id1"), $"embedding".as("e1"),
      transform($"embedding", x => x.cast("double") * 0.125d).as("d1"))
    val b = e.select($"vec_id".as("id2"), $"embedding".as("e2"),
      transform($"embedding", x => x.cast("double") - 0.25d).as("d2x"))
    val bad = a.join(b, $"id1" < $"id2")
      .select(
        VectorFunctions.vec_l2_exact($"d1", $"d2x").as("dd"),
        l2ExactHof($"d1", $"d2x").as("ddHof"),
        VectorFunctions.vec_l2_exact($"e1", $"d2x").as("fd"),
        l2ExactHof($"e1", $"d2x").as("fdHof"),
        VectorFunctions.vec_l2_exact($"d1", $"e2").as("df"),
        l2ExactHof($"d1", $"e2").as("dfHof"))
      .filter(!($"dd" === $"ddHof") || !($"fd" === $"fdHof") ||
        !($"df" === $"dfHof")).count()
    assert(bad == 0, s"$bad rows diverge from the HOF formulation")
  }

  test("vec_l2_exact adversarial values and null semantics") {
    import spark.implicits._
    val vs = Seq(
      (Array(-1.5f, 2.25f, -3.125f), Array(4.0f, -5.5f, 6.75f)),
      (Array(1e-8f, -1e-8f, 1e8f), Array(1e-8f, 1e-8f, -1e8f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.7f, 0.8f, 0.9f)),
      (Array(Float.MinPositiveValue, 1f), Array(Float.MinPositiveValue, -1f)))
    val rows = vs.toDF("a", "b").select(
      VectorFunctions.vec_l2_exact($"a", $"b").as("native"),
      l2ExactHof($"a", $"b").as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r.toString)
    }
    val nulls = Seq(
      (Some(Seq(Some(1.0f), Some(2.0f))), Some(Seq(Some(3.0f)))), // length mismatch
      (Some(Seq(Some(1.0f), None)), Some(Seq(Some(3.0f), Some(4.0f)))), // null elem
      (None, Some(Seq(Some(1.0f)))) // null array
    ).toDF("a", "b")
      .select($"a".cast("array<float>"), $"b".cast("array<float>"))
      .select(VectorFunctions.vec_l2_exact($"a", $"b")).collect()
    assert(nulls.forall(_.isNullAt(0)))
  }

  test("vec_dot interpreted eval (no codegen) agrees with codegen") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val v = df.select(VectorFunctions.vec_dot($"a", $"b")).head().getDouble(0)
    assert(math.abs(v - 32.0) < 1e-12)
    // interpreted path
    val row = df.select($"a", $"b").head()
    val expr = FloatVecDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f, 3.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(4.0f, 5.0f, 6.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(expr.eval(null).asInstanceOf[Double] == 32.0)
  }

  test("vec_dot is registered for SQL via GraftExtensions") {
    import spark.implicits._
    Seq((Array(1.0f, 1.0f), Array(2.0f, 3.0f))).toDF("a", "b")
      .createOrReplaceTempView("vt")
    val v = spark.sql("SELECT vec_dot(a, b) AS d FROM vt").head().getDouble(0)
    assert(v == 5.0)
  }

  test("vec_dot rejects non-float-array inputs at analysis") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0))).toDF("a", "b") // array<double>
    intercept[Exception] {
      df.select(VectorFunctions.vec_dot($"a", $"b")).head()
    }
  }

  test("lshTopK returns ranked neighbors from shared buckets") {
    val e = graft.Tables.embeddings(spark, sf)
    val res = graft.llm.Similarity.lshTopK(e, k = 3, numPlanes = 4, dims = 64)
    assert(res.count() > 0)
    assert(res.filter(col("rank") > 3).count() == 0)
  }

  test("lshBandedTopK: banding beats full-signature recall, pairs scored once") {
    val e = graft.Tables.embeddings(spark, sf)
    val banded = graft.llm.Similarity.lshBandedTopK(e, k = 3,
      numPlanes = 8, bands = 4, dims = 64)
    assert(banded.filter(col("rank") > 3).count() == 0)
    // each (qid, vid) appears at most once despite multi-band collisions
    assert(banded.groupBy("qid", "vid").count().filter(col("count") > 1).count() == 0)
    val exact = graft.llm.Similarity.bruteForceTopK(e.limit(10), e, k = 3)
      .select("qid", "vid")
    val full = graft.llm.Similarity.lshTopK(e, k = 3, numPlanes = 8, dims = 64)
    val recallBanded = banded.select("qid", "vid").join(exact, Seq("qid", "vid")).count()
    val recallFull = full.select("qid", "vid").join(exact, Seq("qid", "vid")).count()
    // OR-over-bands candidates are a superset of full-signature candidates
    assert(recallBanded >= recallFull,
      s"banding lost recall: $recallBanded < $recallFull")
  }

  test("ivfTopK probes nearest lists and finds most brute-force neighbors") {
    val e = graft.Tables.embeddings(spark, sf)
    val ivf = graft.llm.Similarity.ivfTopK(e, k = 5, nlist = 8, nprobe = 4)
    assert(ivf.filter(col("rank") > 5).count() == 0)
    val exact = graft.llm.Similarity.bruteForceTopK(e.limit(10), e, k = 5)
      .select("qid", "vid")
    val hits = ivf.select("qid", "vid").join(exact, Seq("qid", "vid")).count()
    val total = exact.count()
    // probing half the lists must recover well over half the true neighbors
    assert(hits >= total / 2, s"recall too low: $hits/$total")
  }

  test("VectorMean aggregator computes element-wise means via partial+final agg") {
    import spark.implicits._
    val ds = Seq(
      (0, Array(1.0f, 3.0f)), (0, Array(3.0f, 5.0f)), (1, Array(10.0f, 0.0f)))
      .toDS()
    val agg = new Aggregators.VectorMean(2).toColumn
    val got = ds.groupByKey(_._1).mapValues(_._2).agg(agg).collect().toMap
    assert(got(0).toSeq == Seq(2.0, 4.0))
    assert(got(1).toSeq == Seq(10.0, 0.0))
  }

  test("ivec_dot is bit-equal to the long HOF formulation (incl. negatives)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { _ =>
      val n = 1 + rnd.nextInt(80)
      (Array.fill(n)(rnd.nextLong() % 100000L),
        Array.fill(n)(rnd.nextLong() % 100000L))
    }
    val df = rows.toDF("a", "b")
    val bad = df.select(
        VectorFunctions.ivec_dot($"a", $"b").as("native"),
        aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L),
          (acc, x) => acc + x).as("hof"))
      .filter(!($"native" <=> $"hof")).count()
    assert(bad == 0)
  }

  test("ivec_dot null semantics: null array, null element, length mismatch") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(Some(1L), Some(2L))), Some(Seq(Some(3L)))), // length mismatch
      (Some(Seq(Some(1L), None)), Some(Seq(Some(3L), Some(4L)))), // null elem
      (None, Some(Seq(Some(1L)))) // null array
    ).toDF("a", "b").select($"a".cast("array<bigint>"), $"b".cast("array<bigint>"))
    val got = df.select(VectorFunctions.ivec_dot($"a", $"b")).collect()
    assert(got.forall(_.isNullAt(0)))
  }

  test("ivec_dot is registered for SQL via GraftExtensions") {
    val got = spark.sql(
      "SELECT ivec_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .head().getLong(0)
    assert(got == 32L)
  }

  test("GramExact aggregator is bit-equal to the decimal-cast formulation") {
    import spark.implicits._
    import org.apache.spark.sql.functions.posexplode
    val e = graft.Tables.embeddings(spark, sf).limit(60).cache()
    val d = e.select(size($"embedding")).head().getInt(0)
    val got = e.select($"embedding").as[Array[Float]]
      .select(new Aggregators.GramExact(d).toColumn.name("cells"))
      .head()
    // reference: decimal(30,12)-cast products, exact decimal sum, cast double
    val DEC = org.apache.spark.sql.types.DataTypes.createDecimalType(30, 12)
    val ref = e
      .select($"embedding", posexplode($"embedding").as(Seq("pi", "vpf")))
      .select($"pi", $"vpf".cast("double").as("vp"),
        slice($"embedding", $"pi" + 1, size($"embedding") - $"pi").as("tailv"))
      .select($"pi", $"vp", posexplode($"tailv").as(Seq("j", "vqf")))
      .select($"pi", ($"pi" + $"j").as("qi"),
        ($"vp" * $"vqf".cast("double")).cast(DEC).as("term"))
      .groupBy($"pi", $"qi").agg(sum($"term").cast("double").as("g"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for (p <- 0 until d; q <- p until d) {
      val k = p * (2 * d - p + 1) / 2 + (q - p)
      assert(java.lang.Double.doubleToLongBits(got(k)) ==
        java.lang.Double.doubleToLongBits(ref((p, q))),
        s"cell ($p,$q) diverges: ${got(k)} vs ${ref((p, q))}")
    }
  }

  test("GramExact random-floats stress matches the decimal cast per cell") {
    import spark.implicits._
    import org.apache.spark.sql.functions.posexplode
    val rnd = new scala.util.Random(11)
    val dims = 8
    val vecs = Seq.fill(300)(Array.fill(dims)(
      (rnd.nextFloat() * 4f - 2f) * (if (rnd.nextInt(5) == 0) 1e-6f else 1f)))
    val e = vecs.toDF("embedding").cache()
    val got = e.select($"embedding").as[Array[Float]]
      .select(new Aggregators.GramExact(dims).toColumn.name("cells")).head()
    val DEC = org.apache.spark.sql.types.DataTypes.createDecimalType(30, 12)
    val ref = e
      .select($"embedding", posexplode($"embedding").as(Seq("pi", "vpf")))
      .select($"pi", $"vpf".cast("double").as("vp"),
        slice($"embedding", $"pi" + 1, size($"embedding") - $"pi").as("tailv"))
      .select($"pi", $"vp", posexplode($"tailv").as(Seq("j", "vqf")))
      .select($"pi", ($"pi" + $"j").as("qi"),
        ($"vp" * $"vqf".cast("double")).cast(DEC).as("term"))
      .groupBy($"pi", $"qi").agg(sum($"term").cast("double").as("g"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for (p <- 0 until dims; q <- p until dims) {
      val k = p * (2 * dims - p + 1) / 2 + (q - p)
      assert(java.lang.Double.doubleToLongBits(got(k)) ==
        java.lang.Double.doubleToLongBits(ref((p, q))),
        s"cell ($p,$q) diverges: ${got(k)} vs ${ref((p, q))}")
    }
  }

  test("TopK aggregator keeps exactly k best with deterministic tie-break") {
    import spark.implicits._
    val ds = Seq((1, 0.5, 10L), (1, 0.9, 11L), (1, 0.9, 12L), (1, 0.1, 13L))
      .toDS()
    val agg = new Aggregators.TopK(2).toColumn
    val got = ds.groupByKey(_._1).mapValues(t => (t._2, t._3)).agg(agg).collect().toMap
    assert(got(1) == Seq((0.9, 11L), (0.9, 12L)))
  }
}
