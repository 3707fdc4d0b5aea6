package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** §2.7: langid on planted genuine-language sentences (the synthetic corpus
  * text does not correlate with its lang column), quality metric sanity. */
class TextAnalysisSpec extends SparkSpec {

  TextAnalysis.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("x_normalize output is lowercase alnum+space only") {
    val bad = TextAnalysis.xNormalize(spark, sf)
      .filter(col("norm_text").rlike("[^a-z0-9 ]")).count()
    assert(bad == 0, s"$bad rows contain non-normalized characters")
  }

  test("x_scrub leaves no emails or URLs behind") {
    val left = TextAnalysis.xScrub(spark, sf)
      .filter(col("scrubbed").rlike("@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}") ||
        col("scrubbed").contains("https://")).count()
    assert(left == 0, s"$left rows still contain PII patterns")
    val tokens = TextAnalysis.xScrub(spark, sf)
      .filter(col("scrubbed").contains("<EMAIL>") &&
        col("scrubbed").contains("<URL>")).count()
    assert(tokens > 0, "scrubber never fired")
  }

  test("x_langid predicts planted genuine-language sentences correctly") {
    import spark.implicits._
    val planted = Seq(
      (1L, "the cat sat on the mat and it is a good day for the walk", "en"),
      (2L, "el perro corre por la calle y se va del parque por la tarde", "es"),
      (3L, "le chien est dans le jardin et les enfants jouent avec un ballon du parc", "fr"),
      (4L, "der hund ist in den garten und die kinder spielen mit des balles von zu haus", "de"))
      .toDF("doc_id", "text", "expected")
    val pred = TextAnalysis.langidOn(planted.select("doc_id", "text"))
      .select("doc_id", "pred_lang")
      .join(planted.select("doc_id", "expected"), "doc_id")
      .collect()
    pred.foreach { r =>
      assert(r.getAs[String]("pred_lang") == r.getAs[String]("expected"),
        s"doc ${r.getAs[Long]("doc_id")}: ${r.getAs[String]("pred_lang")}")
    }
  }

  test("x_langid is deterministic and total over the corpus") {
    val a = TextAnalysis.xLangid(spark, sf).collect()
    val b = TextAnalysis.xLangid(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.length == Tables.t(spark, sf, "documents").count())
  }

  test("x_quality metrics are in-range and consistent") {
    val rows = TextAnalysis.xQuality(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("punct_ratio") >= 0 && r.getAs[Double]("punct_ratio") <= 1)
      assert(r.getAs[Double]("stopword_ratio") >= 0 && r.getAs[Double]("stopword_ratio") <= 1)
      assert(r.getAs[Double]("repetition") >= 0 && r.getAs[Double]("repetition") < 1)
      assert(r.getAs[Double]("mean_word_len") > 0)
    }
  }

  test("x_tokcount: regex tokens >= whitespace tokens on space-joined words") {
    val bad = TextAnalysis.xTokcount(spark, sf)
      .filter(col("re_tokens") < col("ws_tokens")).count()
    assert(bad == 0)
  }

  test("x_docstats totals reconcile with the corpus") {
    val stats = TextAnalysis.xDocstats(spark, sf)
    val total = stats.agg(sum("n_docs")).collect().head.getLong(0)
    assert(total == Tables.t(spark, sf, "documents").count())
  }
}
