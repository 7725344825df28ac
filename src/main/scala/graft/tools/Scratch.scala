package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev scratchpad main — ad-hoc probes during development; not part of the
  * engine surface and free of engine logic.
  *
  * Current probe: decompose q44/q102 cost at sf0.1 (round-6 closing showed
  * 0.82→1.89 s / 0.96→2.44 s vs round 5 on unchanged code) — time the
  * decode-only scan, the q44 oracle side-dump, and the full query bodies
  * over repeats in one JVM to separate fixed costs from per-repeat ones.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32, "scratch")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d = "/root/testdata/sf0.1"
    graft.SparkEntry.stage(spark, d)
    (1 to 4).foreach { i =>
      spark.catalog.clearCache()
      t(s"q44 decode-only rep$i") {
        graft.multimodal.Multimodal.decodeAll(
          graft.multimodal.Multimodal.imageTable(spark, d),
          graft.multimodal.Multimodal.ImageIODecoder).toDF().foreach(_ => ())
      }
    }
    (1 to 4).foreach { i =>
      spark.catalog.clearCache()
      t(s"q44 dump-only rep$i") {
        graft.util.OracleDump.dump(
          graft.multimodal.Multimodal.imageTable(spark, d).toDF("doc_id", "media"), "q44_probe")
      }
    }
    (1 to 4).foreach { i =>
      spark.catalog.clearCache()
      t(s"q44 full rep$i") {
        graft.SparkEntry.queries("q44_media_decode")(spark, d).foreach(_ => ())
      }
    }
    (1 to 4).foreach { i =>
      spark.catalog.clearCache()
      t(s"q102 full rep$i") {
        graft.SparkEntry.queries("q102_video_frames")(spark, d).foreach(_ => ())
      }
    }
  }
}
