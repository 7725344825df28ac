package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.similarity.Similarity

/** q166's quality claim, measured: int8 scalar quantization + exact
  * re-rank must recover nearly all of the brute-force top-5 — the
  * quantized index is 4× smaller, and the approx-candidate → exact
  * re-rank split is what keeps the emitted scores exact regardless.
  */
class QuantizedAnnSpec extends SparkSpec {

  test("int8-quantized ANN keeps recall@5 >= 0.9 vs brute force") {
    val d = sf("sf0.01")
    val got = SparkEntry.queries("q166_quantized_ann")(spark, d)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = Tables.embeddings(spark, d)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val queries = base.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val brute = Similarity.bruteForceTopK(queries, base, "q_id", "vec_id", "qv", "v", 5)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    val recall = got.intersect(brute).size.toDouble / brute.size
    info(f"recall@5 vs brute force: $recall%.3f (${got.intersect(brute).size}/${brute.size})")
    assert(recall >= 0.9, f"quantization lost too much recall: $recall%.3f")
  }

  test("composed quantized-IVF (q168) routes cells — no corpus-wide scan in the plan") {
    // q166's registered probe is an explicit full scan (crossJoin → BNLJ);
    // the COMPOSED index must instead reach candidates through a hash
    // join on the routed __cell — a nested-loop join anywhere in the
    // probe plan means the corpus is being scanned per query batch again
    val df = SparkEntry.queries("q168_quantized_ivf")(spark, sf("sf0.001"))
    val phys = df.queryExecution.executedPlan.toString()
    assert(!phys.contains("BroadcastNestedLoopJoin") && !phys.contains("CartesianProduct"),
      "composed probe plan fell back to a corpus-wide scan:\n" + phys.take(2000))
    assert(phys.contains("BroadcastHashJoin"), "expected broadcast hash join on __cell")
  }

  test("composed quantized-IVF emits EXACT scores and >= 0.9 recall@5 vs brute") {
    val d = sf("sf0.01")
    val got = SparkEntry.queries("q168_quantized_ivf")(spark, d)
      .select("q_id", "vec_id", "cos")
    val base = Tables.embeddings(spark, d)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val queries = base.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    // every emitted (q_id, vec_id, cos) must carry the FULL-PRECISION
    // cosine — the re-rank contract: quantization moves which candidates
    // surface, never the scores the user sees
    val exact = Similarity.bruteForceTopK(queries, base, "q_id", "vec_id", "qv", "v",
        k = Int.MaxValue - 1)
      .select(col("q_id"), col("vec_id"), col("cos").as("cos_exact"))
    val joined = got.join(exact, Seq("q_id", "vec_id"), "left")
    assert(joined.filter(col("cos_exact").isNull || col("cos") =!= col("cos_exact")).count() == 0,
      "an emitted score differs from the full-precision cosine")
    val gotSet = got.select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(queries, base, "q_id", "vec_id", "qv", "v", 5)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = gotSet.intersect(brute).size.toDouble / brute.size
    info(f"composed recall@5 vs brute force: $recall%.3f")
    assert(recall >= 0.9, f"cell routing + quantization lost too much recall: $recall%.3f")
  }

  test("composed FAST path (fused Int8Dot scan) returns the decimal path's results") {
    // the production configuration (exact=false: IEEE dots + the SQ8 scan
    // identity) must surface the same neighbors as the oracle-gated
    // decimal path — FP reassociation may only flip genuine rounding ties
    val d = sf("sf0.01")
    val base = Tables.embeddings(spark, d)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val cents = base.filter(pmod(col("vec_id"), lit(500)) === 0)
      .select(col("vec_id").as("__cell"), col("v").as("__cv"))
    val queries = base.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val cb = Similarity.affineCodebook(base, "v", 64)
    def run(exact: Boolean) = Similarity.ivfQuantizedTopK(base, queries, cents, cb,
        "q_id", "vec_id", "qv", "v", k = 5, nprobe = 2, rerank = 20, exact = exact)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dec = run(exact = true)
    val fast = run(exact = false)
    val overlap = dec.intersect(fast).size.toDouble / dec.size
    info(f"fast/decimal top-5 agreement: $overlap%.3f (${dec.intersect(fast).size}/${dec.size})")
    assert(overlap >= 0.98, f"fused fast path diverged from the decimal path: $overlap%.3f")
  }

  test("int8 codes dequantize within half a quantization step") {
    val base = Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val cb = Similarity.affineCodebook(base, "v", 64)
    val maxStep = cb.los.zip(cb.his).map { case (l, h) => (h - l) / 255.0 }.max
    val err = base
      .select(Similarity.dequantize(Similarity.int8Codes(col("v"), cb), cb).as("vh"), col("v"))
      .select(aggregate(zip_with(col("v"), col("vh"), (a, b) => abs(a - b)),
        lit(0.0), (acc, x) => greatest(acc, x)).as("e"))
      .agg(max("e")).head().getDouble(0)
    info(f"max |x - dequant(code(x))| = $err%.6f, half-step bound = ${maxStep / 2}%.6f")
    assert(err <= maxStep / 2 + 1e-12)
  }
}
