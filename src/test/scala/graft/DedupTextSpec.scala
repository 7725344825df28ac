package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextOps
import graft.similarity.Similarity

class DedupTextSpec extends SparkSpec {
  import spark.implicits._

  test("hash32 is the first 8 md5 hex chars as int (portable contract)") {
    val got = Seq("abc").toDF("s").select(TextOps.hash32($"s")).head().getLong(0)
    assert(got == java.lang.Long.parseLong("90015098", 16)) // md5("abc") = 90015098...
  }

  test("wordNgrams produces space-joined n-grams; short docs give empty") {
    val df = Seq("a b c d", "a b").toDF("t")
      .select(TextOps.wordNgrams(TextOps.words($"t"), 3).as("g"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("a b c", "b c d"))
    assert(rows(1) == Seq())
  }

  test("jaccard: identical=1, disjoint=0, known overlap") {
    val df = Seq(
      (Seq("x", "y"), Seq("x", "y")),
      (Seq("x"), Seq("y")),
      (Seq("a", "b", "c"), Seq("b", "c", "d"))
    ).toDF("a", "b").select(Dedup.jaccard($"a", $"b").as("j"))
    val j = df.collect().map(_.getDouble(0))
    assert(j(0) == 1.0 && j(1) == 0.0 && j(2) == 0.5)
  }

  test("identical docs share all band signatures; near-dups share some band") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "quick brown fox jumps over the lazy dog again and again"), // first word dropped
      (4L, "completely different words entirely unrelated content here now today")
    ).toDF("doc_id", "text")
    val pairs = Dedup.candidatePairs(Dedup.bandTable(docs, "doc_id", "text"), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"exact dup not found: $pairs")
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)), s"near dup not found: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), s"false positive: $pairs")
  }

  test("native MinHashSketch matches the composed k-array_min formulation bit-for-bit") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "quick brown fox jumps over the lazy dog again and again",
      "completely different words entirely unrelated content here now today",
      "a b c", // exactly one 3-shingle
      "short one" // below shingle length → empty hash array → null sketch
    ).toDF("text")
    val hs = transform(TextOps.wordNgrams(TextOps.words($"text"), 3), TextOps.hash32(_))
    val both = docs.select(
      Dedup.minhashes(hs).as("native"),
      Dedup.minhashesComposed(hs).as("composed"))
    both.collect().foreach { r =>
      val native = if (r.isNullAt(0)) null else r.getSeq[Long](0)
      val composed0 = if (r.isNullAt(1)) null else r.getSeq[Any](1)
      if (native == null) {
        // composed gives an array of k nulls for an empty hash array;
        // native collapses that to a null array (no doc reaches either
        // state past bandTable's size filter)
        assert(composed0 == null || composed0.forall(_ == null))
      } else {
        assert(native == composed0.map(_.asInstanceOf[Long]))
      }
    }
  }

  test("simhash: identical docs equal; unrelated docs differ") {
    val hs = (c: org.apache.spark.sql.Column) => transform(TextOps.words(c), TextOps.hash32(_))
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog"),
      ("b", "the quick brown fox jumps over the lazy dog"),
      ("c", "completely different unrelated content")
    ).toDF("id", "t").select($"id", Dedup.simhash32(hs($"t")).as("sh"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") == m("b") && m("a") != m("c"))
    assert(m("a") >= 0 && m("a") < (1L << 32))
  }

  test("native SimHash matches the composed 32-aggregate formulation bit-for-bit") {
    val hs = (c: org.apache.spark.sql.Column) => transform(TextOps.words(c), TextOps.hash32(_))
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "completely different unrelated content",
      "x", // single token
      ""   // split("") = [""] → one (hashed) empty-string token
    ).toDF("t").select(
      Dedup.simhash32(hs($"t")).as("native"),
      Dedup.simhash32Composed(hs($"t")).as("composed"))
    df.collect().foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("fingerprint is position-sensitive (permutation changes it)") {
    val df = Seq("a b c", "c b a").toDF("t")
      .select(TextOps.fingerprint(TextOps.words($"t")).as("fp"))
    val fps = df.collect().map(_.getLong(0))
    assert(fps(0) != fps(1))
  }

  test("native DecimalDot matches the composed zip/fold form bit-for-bit") {
    val df = Seq(
      (Seq(0.1, -0.25, 3.0), Seq(1.5, 2.0, -0.125)),
      (Seq(1e-11, 2e-11), Seq(1.0, 1.0)), // below quantization scale
      (Seq(0.1), Seq(0.1, 0.2)) // length mismatch → null
    ).toDF("a", "b").select(
      Similarity.dotDec($"a", $"b").as("native"),
      Similarity.dotDecComposed($"a", $"b").as("composed"))
    df.collect().foreach { r =>
      val n = if (r.isNullAt(0)) null else r.getDouble(0)
      val c = if (r.isNullAt(1)) null else r.getDouble(1)
      assert(n == c, r.toString)
    }
  }

  test("DoubleDot fast path agrees with DecimalDot within 1e-8 relative") {
    // the production fast path trades the per-element decimal quantization
    // for IEEE summation; on unit-scale embedding values the two must
    // agree to well below any ranking-relevant difference (cos rounds to
    // 6 decimals downstream), and null semantics must match exactly
    val vecs = spark.range(200).select(
      transform(sequence(lit(0), lit(31)), c => {
        val h = pmod((col("id") * 32 + c) * (col("id") * 32 + c) + (col("id") * 32 + c) * 2654435761L,
          lit(1000000007L))
        pmod(h * 1103515245L + 12345L, lit(998244353L)).cast("double") / 998244353.0 * 2.0 - 1.0
      }).as("a"),
      transform(sequence(lit(0), lit(31)), c => {
        val h = pmod((col("id") * 32 + c + 7) * (col("id") * 32 + c + 7) + (col("id") * 32 + c) * 1099511628211L,
          lit(1000000007L))
        pmod(h * 1103515245L + 12345L, lit(998244353L)).cast("double") / 998244353.0 * 2.0 - 1.0
      }).as("b"))
    val rows = vecs.select(
      Similarity.dotDec($"a", $"b").as("dec"),
      Similarity.dotF($"a", $"b").as("fast")).collect()
    rows.foreach { r =>
      val (d, f) = (r.getDouble(0), r.getDouble(1))
      val rel = math.abs(d - f) / math.max(1.0, math.max(math.abs(d), math.abs(f)))
      assert(rel <= 1e-8, s"dec=$d fast=$f rel=$rel")
    }
    val nulls = Seq((Seq(0.1), Seq(0.1, 0.2))).toDF("a", "b")
      .select(Similarity.dotF($"a", $"b")).head()
    assert(nulls.isNullAt(0), "length mismatch must be null on the fast path too")
  }

  test("cosineDec: self=1, orthogonal=0; signBucket deterministic") {
    val r = Seq((Seq(1.0, 0.0), Seq(0.0, 2.0))).toDF("a", "b").select(
      Similarity.cosineDec($"a", $"a").as("self"),
      Similarity.cosineDec($"a", $"b").as("orth")).head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
    val vecs = Seq(Tuple1(Seq.fill(64)(0.1))).toDF("v")
    val b1 = vecs.select(Similarity.signBucket($"v", 8, 64)).head().getLong(0)
    val b2 = vecs.select(Similarity.signBucket($"v", 8, 64)).head().getLong(0)
    assert(b1 == b2 && b1 >= 0 && b1 < 256)
  }

  test("IVF top-k recall vs the brute-force baseline on a multi-cell corpus") {
    import graft.similarity.Similarity
    // deterministic LCG corpus: 300 vectors, 16 dims; centroids = every
    // 30th vector → 10 cells, so probing is non-trivial (unlike the tiny
    // sf dirs where a single centroid makes IVF degenerate to exact)
    val base = spark.range(300).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)), c => {
        val h = pmod((col("id") * 16 + c) * 1103515245L + 12345L, lit(2147483647L))
        h.cast("double") / 2147483647.0 * 2.0 - 1.0
      }).as("v"))
    val queries = base.filter(pmod(col("vec_id"), lit(25)) === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val cents = base.filter(pmod(col("vec_id"), lit(30)) === 0)
      .select(col("vec_id").as("__cell"), col("v").as("__cv"))
    val exact = Similarity.bruteForceTopK(queries, base, "q_id", "vec_id", "qv", "v", 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(base, queries, cents, "q_id", "vec_id", "qv", "v", 5, nprobe = 2)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // random uniform vectors are a worst case for coarse quantization;
    // the gate is that probing 2/10 cells recovers far more than the
    // ~20% a random 2-cell scan would
    assert(recall >= 0.4, s"recall@5 = $recall")
    assert(approx.nonEmpty && exact.size == queries.count() * 5)
  }

  test("exactGroups counts copies and keeps min id") {
    val df = Seq((10L, "same"), (3L, "same"), (7L, "other")).toDF("doc_id", "text")
    val got = Dedup.exactGroups(df, "doc_id", "text")
      .select("canonical_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(got == Set((3L, 2L), (7L, 1L)))
  }

  test("connectedComponents agrees with driver-side union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val n = 40 + trial * 20
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(x => x -> find(x)).toMap
      // union-find roots are not guaranteed min-of-component; normalize both
      // sides to (node → min node of its group)
      val expGroups = expected.groupBy(_._2).values
        .flatMap(g => { val m = g.keys.min; g.keys.map(_ -> m) }).toMap
      val got = Dedup.connectedComponents(
        edges.toDF("id_a", "id_b"), "id_a", "id_b").as[(Long, Long)].collect().toMap
      assert(got == expGroups, s"trial $trial: $got vs $expGroups")
    }
  }

  test("connectedComponents: Checkpoint lineage mode produces identical components") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val viaRdd = Dedup.connectedComponents(pairs, "id_a", "id_b",
      lineage = Dedup.Lineage.RddRebuild)
    val viaCkpt = Dedup.connectedComponents(pairs, "id_a", "id_b",
      lineage = Dedup.Lineage.Checkpoint)
    try {
      assert(viaRdd.as[(Long, Long)].collect().toMap ==
        viaCkpt.as[(Long, Long)].collect().toMap)
    } finally { viaRdd.unpersist(); viaCkpt.unpersist() }
  }

  test("connectedComponents releases every intermediate cache, incl. on failure") {
    val sc = spark.sparkContext
    def cachedBlocks(): Int = sc.getPersistentRDDs.size
    val before = cachedBlocks()
    val res = Dedup.connectedComponents(
      Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b"), "id_a", "id_b")
    assert(cachedBlocks() == before + 1, "only the returned result should stay cached")
    res.unpersist()
    assert(cachedBlocks() == before)
    // non-convergence path (maxIter 0 can't converge a real edge set) must
    // not leak the edge or round caches either
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(
        Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b"), "id_a", "id_b", maxIter = 1)
    }
    assert(cachedBlocks() == before, "failure path leaked a cache")
  }

  test("connectedComponents labels every node with its cluster min") {
    // chain 1-2-3-4-5 (worst-case diameter), triangle 10-11-12 with a
    // redundant edge, isolated pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(got(_) == 1L), got.toString)
    assert(Seq(10L, 11L, 12L).forall(got(_) == 10L))
    assert(got(20L) == 20L && got(21L) == 20L)
    assert(got.size == 10)
  }
}
