package graft

import graft.operators.FunctionLib
import org.apache.spark.sql.functions._

/** §2.3 families: run + semantic checks. Value gate = DuckDB oracle except
  * where algorithms are non-portable (a_approx) or DuckDB lacks the builtin
  * (sha224/384/512, sha1, crc32) — those get known-answer tests here. */
class FunctionLibSpec extends SparkSpec {

  FunctionLib.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty && df.count() > 0)
    }
  }

  test("f_trig: circular and hyperbolic identities hold at 6dp") {
    FunctionLib.fTrig(spark, sf).collect().foreach { r =>
      val (sn, cs) = (r.getAs[Double]("sn"), r.getAs[Double]("cs"))
      val (snh, csh) = (r.getAs[Double]("snh"), r.getAs[Double]("csh"))
      assert(math.abs(sn * sn + cs * cs - 1.0) < 1e-5)
      assert(math.abs(csh * csh - snh * snh - 1.0) < 1e-4)
      assert(math.abs(r.getAs[Double]("tn") - sn / cs) < 1e-4)
    }
  }

  test("f_tz: conversion semantics pinned against hand-computed instants " +
    "across the US/EU DST transitions and a half-hour-offset zone — the " +
    "spec-only gate the DuckDB oracle can't provide (SURVEY §7a)") {
    import spark.implicits._
    // (utc instant, expected NY wall, expected Berlin wall, expected
    //  Kolkata wall, expected NY round-trip) — offsets hand-derived from
    // the zone rules: US transition 2021-03-14 07:00 UTC / 2021-11-07
    // 06:00 UTC; EU transition 2021-03-28 01:00 UTC / 2021-10-31 01:00 UTC
    val cases = Seq(
      // pre-spring-forward: NY still EST (-5), Berlin CET (+1)
      ("2021-03-14 06:30:00", "01:30:00", "07:30:00", "12:00:00", true),
      // post-gap: NY 02:30 local never exists — lands at 03:30 EDT (-4)
      ("2021-03-14 07:30:00", "03:30:00", "08:30:00", "13:00:00", true),
      // fall-back FIRST pass of the repeated hour: 01:30 EDT (-4);
      // to_utc resolves the ambiguous wall-clock to the EARLIER offset
      // (java.time overlap rule) = this very instant → round-trips true
      ("2021-11-07 05:30:00", "01:30:00", "06:30:00", "11:00:00", true),
      // SECOND pass: same 01:30 wall-clock, now EST (-5); the reverse
      // mapping picks the first pass → round-trip FALSE by design
      ("2021-11-07 06:30:00", "01:30:00", "07:30:00", "12:00:00", false),
      // EU spring-forward: Berlin 02:30 local never exists → 03:30 CEST
      ("2021-03-28 00:30:00", "20:30:00", "01:30:00", "06:00:00", true),
      ("2021-03-28 01:30:00", "21:30:00", "03:30:00", "07:00:00", true),
      // plain summer instant: NY EDT (-4), Berlin CEST (+2), Kolkata +5:30
      ("2021-06-01 00:00:00", "20:00:00", "02:00:00", "05:30:00", true))
    val got = cases.map(_._1).toDF("s")
      .select(to_timestamp(col("s")).as("ts")) // session is UTC → instants
      .select(col("ts"),
        date_format(from_utc_timestamp(col("ts"), "America/New_York"),
          "HH:mm:ss").as("ny"),
        date_format(from_utc_timestamp(col("ts"), "Europe/Berlin"),
          "HH:mm:ss").as("berlin"),
        date_format(from_utc_timestamp(col("ts"), "Asia/Kolkata"),
          "HH:mm:ss").as("kolkata"),
        (to_utc_timestamp(from_utc_timestamp(col("ts"), "America/New_York"),
          "America/New_York") === col("ts")).as("rt"))
      .collect().map(r => (r.getAs[String]("ny"), r.getAs[String]("berlin"),
        r.getAs[String]("kolkata"), r.getAs[Boolean]("rt")))
    cases.zip(got).foreach { case ((utc, ny, be, ko, rt), (gNy, gBe, gKo, gRt)) =>
      assert(gNy == ny, s"$utc NY wall: got $gNy want $ny")
      assert(gBe == be, s"$utc Berlin wall: got $gBe want $be")
      assert(gKo == ko, s"$utc Kolkata wall: got $gKo want $ko")
      assert(gRt == rt, s"$utc NY round-trip: got $gRt want $rt")
    }
    // the entry itself: every event converts, and round-trip is true for
    // all events whose NY wall-clock avoids the repeated hour (the corpus
    // spans 1995-2000 summer/winter dates — ambiguous instants are rare
    // but not impossible, so assert the overwhelming majority, not all)
    val e = FunctionLib.fTz(spark, sf).cache()
    try {
      val n = e.count()
      assert(n > 0)
      val rtTrue = e.filter(col("ny_round_trip")).count()
      assert(rtTrue >= n - (n / 100),
        s"round-trip true for only $rtTrue/$n events")
      assert(e.filter(col("kolkata_wall").isNull).count() == 0)
    } finally e.unpersist()
  }

  test("sha1/sha2-224/384/512 match java.security.MessageDigest; crc32 matches zlib") {
    import spark.implicits._
    val s = "Customer#000000001"
    val row = Seq(s).toDF("x").select(
      sha1(col("x").cast("binary")).as("h1"),
      sha2(col("x").cast("binary"), 224).as("h224"),
      sha2(col("x").cast("binary"), 384).as("h384"),
      sha2(col("x").cast("binary"), 512).as("h512"),
      crc32(col("x").cast("binary")).as("c32")).collect().head

    def jdk(alg: String): String =
      java.security.MessageDigest.getInstance(alg)
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val crc = new java.util.zip.CRC32()
    crc.update(s.getBytes("UTF-8"))

    assert(row.getAs[String]("h1") == jdk("SHA-1"))
    assert(row.getAs[String]("h224") == jdk("SHA-224"))
    assert(row.getAs[String]("h384") == jdk("SHA-384"))
    assert(row.getAs[String]("h512") == jdk("SHA-512"))
    assert(row.getAs[Long]("c32") == crc.getValue)
  }

  test("nanvl/isnan handle actual NaN (not exercised by clean table data)") {
    import spark.implicits._
    val row = Seq(1.0).toDF("x").select(
      isnan(sqrt(lit(-1.0))).as("is_nan"),
      nanvl(sqrt(lit(-1.0)), lit(42.0)).as("repl")).collect().head
    assert(row.getAs[Boolean]("is_nan") && row.getAs[Double]("repl") == 42.0)
  }

  test("a_approx within HLL/quantile-sketch error bounds of exact values") {
    val approx = FunctionLib.aApprox(spark, sf01).collect()
      .map(r => r.getAs[String]("o_orderstatus") -> r).toMap
    val exact = Tables.t(spark, sf01, "orders")
      .groupBy("o_orderstatus")
      .agg(countDistinct("o_custkey").as("cd"),
        percentile(col("o_totalprice"), lit(0.5)).as("p50")).collect()
    exact.foreach { r =>
      val a = approx(r.getAs[String]("o_orderstatus"))
      val cdExact = r.getAs[Long]("cd").toDouble
      val cdApprox = a.getAs[Long]("acd_cust").toDouble
      assert(math.abs(cdApprox - cdExact) / cdExact < 0.05,
        s"HLL err ${cdApprox} vs ${cdExact}")
      val p50Exact = r.getAs[Double]("p50")
      val p50Approx = a.getAs[Double]("ap50")
      assert(math.abs(p50Approx - p50Exact) / p50Exact < 0.05,
        s"approx_percentile err ${p50Approx} vs ${p50Exact}")
      val amed = a.getAs[Double]("amed")
      assert(math.abs(amed - p50Exact) / p50Exact < 0.05,
        s"approx_median err ${amed} vs exact median ${p50Exact}")
    }
  }

  test("a_hll_rollup: unioned daily sketches estimate the true distinct users") {
    val r = FunctionLib.aHllRollup(spark, sf01).collect().head
    val exact = Tables.t(spark, sf01, "events")
      .select(countDistinct("user_id")).collect().head.getLong(0)
    val est = r.getAs[Long]("est_distinct_users")
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"sketch union estimate $est vs exact $exact")
    assert(r.getAs[Long]("n_events") ==
      Tables.t(spark, sf01, "events").count())
  }

  test("a_kll_rollup: merged daily quantile sketches land inside the exact " +
    "rank-error band; sketch n is exact through the merge") {
    val r = FunctionLib.aKllRollup(spark, sf01).collect().head
    val ev = Tables.t(spark, sf01, "events")
    def exactQ(p: Double): Double =
      ev.agg(expr(s"percentile(value, $p)")).collect().head.getDouble(0)
    // KLL's guarantee is on RANK, not value: the estimate must sit between
    // the exact quantiles at p ± 3% (k=200 ⇒ ~1.65% rank error, doubled
    // for headroom since merges compound it)
    Seq(0.5 -> "est_p50", 0.9 -> "est_p90", 0.99 -> "est_p99").foreach {
      case (p, c) =>
        val est = r.getAs[Double](c)
        val lo = exactQ(math.max(0.0, p - 0.03))
        val hi = exactQ(math.min(1.0, p + 0.03))
        assert(est >= lo && est <= hi, s"$c=$est outside rank band [$lo, $hi]")
    }
    assert(r.getAs[Long]("n_events") == ev.count())
    // n is EXACT in a KLL sketch and must survive the daily→total merge;
    // the one-shot sketch over raw values sits in the same rank band
    val daily = ev.groupBy(to_date(col("ts")).as("day"))
      .agg(expr("kll_sketch_agg_double(value)").as("sk"))
    val merged = daily.agg(
      expr("kll_sketch_get_n_double(kll_merge_agg_double(sk))").as("n"),
      expr("kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.9)").as("q90"))
      .collect().head
    assert(merged.getAs[Long]("n") == ev.count(),
      "sketch n must be exact through the merge")
    val oneShot = ev.agg(expr(
      "kll_sketch_get_quantile_double(kll_sketch_agg_double(value), 0.9)"))
      .collect().head.getDouble(0)
    assert(oneShot >= exactQ(0.87) && oneShot <= exactQ(0.93),
      s"one-shot sketch p90 $oneShot outside rank band")
  }

  test("a_theta_ops: sketch set algebra EXACT below nominal capacity; " +
    "union/intersection/difference partition consistently") {
    val r = FunctionLib.aThetaOps(spark, sf01).collect().head
    val ev = Tables.t(spark, sf01, "events")
    val clickers = ev.filter(col("event_type") === "click")
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val buyers = ev.filter(col("event_type") === "purchase" && col("value") > 300)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    // both audiences are far below the sketch's 2^12 nominal capacity, so
    // theta runs in exact mode — estimates must equal the true counts
    assert(r.getAs[Long]("est_clickers") == clickers.size.toLong)
    assert(r.getAs[Long]("est_hi_buyers") == buyers.size.toLong)
    assert(r.getAs[Long]("est_either") == clickers.union(buyers).size.toLong)
    assert(r.getAs[Long]("est_both") == clickers.intersect(buyers).size.toLong)
    assert(r.getAs[Long]("est_click_only") == clickers.diff(buyers).size.toLong)
    // algebra self-consistency: |A∖B| + |A∩B| == |A|
    assert(r.getAs[Long]("est_click_only") + r.getAs[Long]("est_both") ==
      r.getAs[Long]("est_clickers"))
    // the construction must be non-degenerate or the set ops prove nothing
    assert(buyers.nonEmpty && buyers.size < clickers.size)
  }

  test("f_array set ops verified on a hand-computed row") {
    val r = FunctionLib.fArray(spark, sf).filter(col("vec_id") === 0).collect().head
    val a = r.getAs[String]("a").split(",").map(_.toInt)
    assert(r.getAs[Int]("card") == a.length)
    assert(r.getAs[String]("srt").split(",").map(_.toInt).toSeq == a.sorted.toSeq)
    assert(r.getAs[Int]("asum") == a.sum)
    assert(r.getAs[String]("dbl").split(",").map(_.toInt).toSeq == a.map(_ * 2).toSeq)
  }
}
