package graft.operators

import scala.util.Random

/** Differential SQL fuzzer (VERDICT r11 #3): a deterministic generator of
  * ANSI-portable queries over the shared TPC-H-ish schema, each runnable
  * verbatim by BOTH Spark SQL and DuckDB so results can be hash-compared
  * (the reference gets this breadth from sqllogictest — 113 JOB texts,
  * thousands of slt rows; 248 hand-written oracle pairs prove the declared
  * inventory, the fuzzer hunts the semantics nobody declared).
  *
  * Dialect discipline (SURVEY §4, the same house rules every oracle text
  * follows):
  *  - every computed column is ALIASED identically for both engines;
  *  - every double-valued aggregate is round()ed (floats compare exact
  *    after both sides' rounding; raw parquet doubles pass through
  *    untouched and compare bit-equal);
  *  - ordering never matters to the compare (the checker sorts rows), so
  *    ORDER BY appears only where semantics need it — LIMIT/OFFSET pages
  *    and window ORDER BY — and there it is TOTAL (unique key included);
  *  - the vocabulary stays in the portable intersection: no engine
  *    functions, no implicit casts, no integer division, no NULL-order
  *    sensitivity.
  *
  * Everything is a pure function of the seed: same seed → same SQL texts →
  * (static testdata) same results, so a green run is reproducible, and a
  * divergence is a minimal repro by construction. FuzzSpec runs ≥500
  * shapes against DuckDB via scripts/fuzz_check.py.
  */
object Fuzz {

  /** `oracle`, when set, is a DIFFERENT spelling of the same query for the
    * DuckDB side (round 15): the EXCLUDE / ORDER BY ALL tier runs the
    * reference-native surface in DuckDB against graft's documented
    * desugaring in Spark — equality across random column sets is the
    * desugaring's correctness proof. Identical-text tiers leave it None. */
  final case class Q(name: String, sql: String, oracle: Option[String] = None)

  // ------------------------------------------------------------ table model
  private case class T(
      name: String,
      uniqueKey: Option[String],
      ints: Seq[(String, Int)], // (column, rough max at sf0.001)
      doubles: Seq[(String, Double, Double)], // (column, lo, hi)
      strs: Seq[(String, Seq[String])], // (column, known values)
      ts: Seq[String])

  private val orders = T("orders", Some("o_orderkey"),
    Seq(("o_orderkey", 1400), ("o_custkey", 140)),
    Seq(("o_totalprice", 2000.0, 450000.0)),
    Seq(("o_orderstatus", Seq("O", "F", "P")),
      ("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW"))),
    Seq("o_orderdate"))

  private val customer = T("customer", Some("c_custkey"),
    Seq(("c_custkey", 140), ("c_nationkey", 24)),
    Seq(("c_acctbal", -500.0, 9500.0)),
    Seq(("c_mktsegment", Seq("MACHINERY", "BUILDING", "FURNITURE",
      "HOUSEHOLD", "AUTOMOBILE"))),
    Seq.empty)

  private val lineitem = T("lineitem", None,
    Seq(("l_orderkey", 1400), ("l_partkey", 190), ("l_suppkey", 9),
      ("l_linenumber", 6)),
    Seq(("l_quantity", 1.0, 50.0), ("l_extendedprice", 1000.0, 100000.0),
      ("l_discount", 0.0, 0.1)),
    Seq(("l_returnflag", Seq("R", "N", "A")),
      ("l_linestatus", Seq("O", "F"))),
    Seq("l_shipdate"))

  private val part = T("part", Some("p_partkey"),
    Seq(("p_partkey", 190), ("p_size", 48)),
    Seq(("p_retailprice", 901.0, 919.0)),
    Seq(("p_brand", Seq("Brand#1", "Brand#12", "Brand#23", "Brand#34",
      "Brand#45")),
      ("p_type", Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL",
        "STANDARD"))),
    Seq.empty)

  private val supplier = T("supplier", Some("s_suppkey"),
    Seq(("s_suppkey", 9), ("s_nationkey", 24)),
    Seq(("s_acctbal", 600.0, 6000.0)),
    Seq.empty,
    Seq.empty)

  private val nation = T("nation", Some("n_nationkey"),
    Seq(("n_nationkey", 24), ("n_regionkey", 4)),
    Seq.empty,
    Seq(("n_name", Seq("NATION_0", "NATION_1", "NATION_7", "NATION_12",
      "NATION_23"))),
    Seq.empty)

  private val tables = Seq(orders, customer, lineitem, part, supplier, nation)

  /** FK join edges: (left table, left col, right table, right col). */
  private val joins = Seq(
    (orders, "o_custkey", customer, "c_custkey"),
    (lineitem, "l_orderkey", orders, "o_orderkey"),
    (lineitem, "l_partkey", part, "p_partkey"),
    (lineitem, "l_suppkey", supplier, "s_suppkey"),
    (customer, "c_nationkey", nation, "n_nationkey"),
    (supplier, "s_nationkey", nation, "n_nationkey"))

  // ------------------------------------------------------------- predicates
  private def pick[A](r: Random, xs: Seq[A]): A = xs(r.nextInt(xs.size))

  private def intPred(r: Random, col: String, max: Int): String =
    r.nextInt(3) match {
      case 0 => s"$col % ${2 + r.nextInt(6)} = ${r.nextInt(2)}"
      case 1 => s"$col < ${1 + r.nextInt(math.max(1, max))}"
      case _ =>
        val a = r.nextInt(math.max(1, max / 2))
        s"$col BETWEEN $a AND ${a + 1 + r.nextInt(math.max(1, max / 2))}"
    }

  private def dblPred(r: Random, col: String, lo: Double, hi: Double): String = {
    val q = lo + (hi - lo) * (0.2 + 0.6 * r.nextDouble())
    val lit = f"$q%.2f"
    if (r.nextBoolean()) s"$col > $lit" else s"$col <= $lit"
  }

  private def strPred(r: Random, col: String, vals: Seq[String]): String =
    r.nextInt(3) match {
      case 0 => s"$col = '${pick(r, vals)}'"
      case 1 =>
        val k = 1 + r.nextInt(math.min(3, vals.size))
        s"$col IN (${r.shuffle(vals).take(k).map(v => s"'$v'").mkString(", ")})"
      case _ => s"$col LIKE '${pick(r, vals).take(1 + r.nextInt(3))}%'"
    }

  private def tsPred(r: Random, col: String): String = {
    val y = 1995 + r.nextInt(6)
    val m = 1 + r.nextInt(12)
    val op = if (r.nextBoolean()) ">=" else "<"
    f"$col $op TIMESTAMP '$y%04d-$m%02d-01 00:00:00'"
  }

  /** One random predicate on any column class the table has. */
  private def anyPred(r: Random, t: T, alias: String = ""): String = {
    val p = if (alias.isEmpty) "" else s"$alias."
    val choices = Seq.newBuilder[() => String]
    t.ints.foreach { case (c, mx) => choices += (() => intPred(r, p + c, mx)) }
    t.doubles.foreach { case (c, lo, hi) =>
      choices += (() => dblPred(r, p + c, lo, hi)) }
    t.strs.foreach { case (c, vs) => choices += (() => strPred(r, p + c, vs)) }
    t.ts.foreach { c => choices += (() => tsPred(r, p + c)) }
    pick(r, choices.result())()
  }

  private def wherePreds(r: Random, t: T, alias: String = ""): String = {
    val n = 1 + r.nextInt(2)
    (0 until n).map(_ => anyPred(r, t, alias))
      .mkString(if (r.nextInt(4) == 0) " OR " else " AND ")
  }

  // ------------------------------------------------------------- aggregates
  /** Aggregate select-list items (beyond count(*) which is always present).
    *
    * DIALECT TRAP (found by this fuzzer, seed 20260814 shape fz_0208, kept
    * out of the vocabulary like srt_nulls/f_cast): `round(avg(money), 2)`
    * diverges when the true average lands EXACTLY on a decimal half —
    * avg(10681.87 / 2) = 5340.935 stores as 5340.93499…95, Spark's HALF_UP
    * on the double gives .93 while DuckDB gives .94. SUMS of 2-decimal
    * money values are boundary-safe (the true sum has 2 decimals, so ulp
    * noise cannot reach a .005 boundary) and stay in the pool; averages
    * produce arbitrary decimals including exact halves and are excluded —
    * a caller who needs a cross-engine-stable mean ships sum and count. */
  private def aggs(r: Random, t: T, alias: String = ""): Seq[String] = {
    val p = if (alias.isEmpty) "" else s"$alias."
    val pool = Seq.newBuilder[String]
    t.doubles.foreach { case (c, _, _) =>
      pool += s"round(sum($p$c), 2) AS sum_${c.drop(2)}"
      pool += s"min($p$c) AS min_${c.drop(2)}"
      pool += s"max($p$c) AS max_${c.drop(2)}"
    }
    t.ints.foreach { case (c, _) =>
      pool += s"count(DISTINCT $p$c) AS nd_${c.drop(2)}"
      pool += s"max($p$c) AS mx_${c.drop(2)}"
    }
    t.strs.foreach { case (c, _) =>
      pool += s"min($p$c) AS lo_${c.drop(2)}"
    }
    val all = r.shuffle(pool.result())
    all.take(1 + r.nextInt(math.min(3, all.size)))
  }

  private def groupCol(r: Random, t: T, alias: String = ""): (String, String) = {
    val p = if (alias.isEmpty) "" else s"$alias."
    val opts = Seq.newBuilder[(String, String)]
    t.strs.foreach { case (c, _) => opts += (s"$p$c" -> c) }
    t.ints.foreach { case (c, _) =>
      opts += (s"$p$c % ${3 + r.nextInt(5)}" -> s"grp_${c.drop(2)}") }
    t.ts.foreach { c =>
      opts += (s"extract(year FROM $p$c)" -> s"yr_${c.drop(2)}") }
    pick(r, opts.result())
  }

  // ----------------------------------------------------------------- shapes
  private def shapeAgg(r: Random, t: T): String = {
    val (gExpr, gName) = groupCol(r, t)
    val extra = aggs(r, t)
    val having = if (r.nextInt(3) == 0) s"\nHAVING count(*) > ${1 + r.nextInt(5)}" else ""
    s"""SELECT $gExpr AS $gName, count(*) AS n,
       |       ${extra.mkString(",\n       ")}
       |FROM ${t.name}
       |WHERE ${wherePreds(r, t)}
       |GROUP BY 1$having""".stripMargin
  }

  private def shapeDistinct(r: Random, t: T): String = {
    val cols = r.shuffle(
      t.strs.map(_._1) ++ t.ints.map(i => s"${i._1} % ${2 + r.nextInt(5)}"))
      .take(2).zipWithIndex.map { case (e, i) => s"$e AS d$i" }
    s"""SELECT DISTINCT ${cols.mkString(", ")}
       |FROM ${t.name}
       |WHERE ${wherePreds(r, t)}""".stripMargin
  }

  private def shapeJoinAgg(r: Random): String = {
    val (lt, lc, rt, rc) = pick(r, joins)
    val (gExpr, gName) = if (r.nextBoolean()) groupCol(r, rt, "b")
                         else groupCol(r, lt, "a")
    val extra = aggs(r, lt, "a")
    s"""SELECT $gExpr AS $gName, count(*) AS n,
       |       ${extra.mkString(",\n       ")}
       |FROM ${lt.name} a
       |JOIN ${rt.name} b ON a.$lc = b.$rc
       |WHERE ${wherePreds(r, lt, "a")}
       |  AND ${wherePreds(r, rt, "b")}
       |GROUP BY 1""".stripMargin
  }

  private def shapeThreeJoin(r: Random): String = {
    // lineitem -> orders -> customer: the hub chain
    val (gExpr, gName) = groupCol(r, customer, "c")
    s"""SELECT $gExpr AS $gName, count(*) AS n,
       |       round(sum(l.l_extendedprice), 2) AS rev,
       |       count(DISTINCT o.o_orderkey) AS nd_ord
       |FROM lineitem l
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |WHERE ${wherePreds(r, lineitem, "l")}
       |  AND ${wherePreds(r, orders, "o")}
       |GROUP BY 1""".stripMargin
  }

  private def shapeWindow(r: Random): String = {
    val t = pick(r, Seq(orders, customer, part, supplier))
    val key = t.uniqueKey.get
    val (s, _) = pick(r, t.strs.map(x => (x._1, x._1)) ++
      t.ints.map(i => (s"${i._1} % ${3 + r.nextInt(4)}", i._1)))
    val (d, _, _) = pick(r, t.doubles)
    val j = 1 + r.nextInt(4)
    if (r.nextBoolean())
      s"""SELECT key, part_of, rn FROM (
         |  SELECT $key AS key, $s AS part_of,
         |         row_number() OVER (PARTITION BY $s
         |           ORDER BY round($d, 2) DESC, $key) AS rn
         |  FROM ${t.name}
         |  WHERE ${wherePreds(r, t)}) x
         |WHERE rn <= $j""".stripMargin
    else
      s"""SELECT $key AS key,
         |       round(sum($d) OVER (PARTITION BY $s ORDER BY $key
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS rsum
         |FROM ${t.name}
         |WHERE ${wherePreds(r, t)}""".stripMargin
  }

  private def shapeSetop(r: Random, t: T): String = {
    val op = pick(r, Seq("UNION ALL", "UNION", "INTERSECT", "EXCEPT"))
    val cols = (t.strs.map(_._1) ++
      t.ints.map(i => s"${i._1} % ${2 + r.nextInt(4)}"))
    val proj = r.shuffle(cols).take(2).zipWithIndex
      .map { case (e, i) => s"$e AS c$i" }.mkString(", ")
    s"""SELECT $proj FROM ${t.name} WHERE ${wherePreds(r, t)}
       |$op
       |SELECT $proj FROM ${t.name} WHERE ${wherePreds(r, t)}""".stripMargin
  }

  private def shapeInSub(r: Random): String = {
    val (lt, lc, rt, rc) = pick(r, joins)
    val (gExpr, gName) = groupCol(r, lt)
    val neg = if (r.nextInt(3) == 0) "NOT " else ""
    s"""SELECT $gExpr AS $gName, count(*) AS n
       |FROM ${lt.name}
       |WHERE $lc ${neg}IN (SELECT $rc FROM ${rt.name}
       |                WHERE ${wherePreds(r, rt)})
       |GROUP BY 1""".stripMargin
  }

  private def shapeScalarSub(r: Random, t: T): String = {
    val (d, _, _) = pick(r, t.doubles)
    val (gExpr, gName) = groupCol(r, t)
    // "above the mean" spelled boundary-safely: d > avg ⟺ d·n > sum, and
    // round(sum, 2) is the exact decimal in both engines (see aggs note) —
    // a rounded-avg threshold could flip rows on decimal halves
    s"""SELECT $gExpr AS $gName, count(*) AS n, round(sum($d), 2) AS s
       |FROM ${t.name}
       |WHERE $d * (SELECT count(*) FROM ${t.name})
       |      > (SELECT round(sum($d), 2) FROM ${t.name})
       |GROUP BY 1""".stripMargin
  }

  private def shapeCase(r: Random, t: T): String = {
    val pred = anyPred(r, t)
    val extra = aggs(r, t)
    s"""SELECT CASE WHEN $pred THEN 'hit' ELSE 'miss' END AS band,
       |       count(*) AS n,
       |       ${extra.mkString(",\n       ")}
       |FROM ${t.name}
       |GROUP BY 1""".stripMargin
  }

  private def shapePage(r: Random): String = {
    val t = pick(r, Seq(orders, customer, part, supplier))
    val key = t.uniqueKey.get
    val cols = Seq(key) ++ t.strs.headOption.map(_._1) ++
      t.doubles.headOption.map(_._1)
    val lim = 5 + r.nextInt(20)
    val off = r.nextInt(50)
    s"""SELECT ${cols.mkString(", ")}
       |FROM ${t.name}
       |WHERE ${wherePreds(r, t)}
       |ORDER BY ${cols.mkString(", ")}
       |LIMIT $lim OFFSET $off""".stripMargin
  }

  private def shapeLeftJoin(r: Random): String = {
    // LEFT joins exercise NULL production: the right side is pre-filtered
    // in a derived table (a WHERE on the outer query would re-inner it);
    // count(b-col) vs count(*) pins the matched/unmatched split
    val (lt, lc, rt, rc) = pick(r, joins)
    val (gExpr, gName) = groupCol(r, lt, "a")
    s"""SELECT $gExpr AS $gName, count(*) AS n, count(b.$rc) AS matched
       |FROM ${lt.name} a
       |LEFT JOIN (SELECT $rc FROM ${rt.name}
       |           WHERE ${wherePreds(r, rt)}) b ON a.$lc = b.$rc
       |WHERE ${wherePreds(r, lt, "a")}
       |GROUP BY 1""".stripMargin
  }

  private def shapeFullJoin(r: Random, t: T): String = {
    // FULL OUTER between two filtered projections of one table: NULLs on
    // both sides, coalesced key, raw measure columns pass through
    val key = t.uniqueKey.get
    val (d, _, _) = pick(r, t.doubles)
    s"""SELECT coalesce(x.k, y.k) AS k, x.va AS va, y.vb AS vb
       |FROM (SELECT $key AS k, $d AS va FROM ${t.name}
       |      WHERE ${wherePreds(r, t)}) x
       |FULL JOIN (SELECT $key AS k, $d AS vb FROM ${t.name}
       |           WHERE ${wherePreds(r, t)}) y ON x.k = y.k""".stripMargin
  }

  private def shapeCte(r: Random, t: T): String = {
    val (gExpr, gName) = groupCol(r, t)
    val (d, _, _) = pick(r, t.doubles)
    s"""WITH f AS (SELECT * FROM ${t.name} WHERE ${wherePreds(r, t)}),
       |     g AS (SELECT $gExpr AS $gName, count(*) AS n,
       |                  round(sum($d), 2) AS s
       |           FROM f GROUP BY 1)
       |SELECT $gName, n, s FROM g WHERE n > ${r.nextInt(4)}""".stripMargin
  }

  private def shapeExists(r: Random): String = {
    val (lt, lc, rt, rc) = pick(r, joins)
    val (gExpr, gName) = groupCol(r, lt, "a")
    val neg = if (r.nextInt(3) == 0) "NOT " else ""
    // ENGINE TRAP #4 (found by this tier, seed 20260815 shape fz_0740):
    // wherePreds can emit a top-level OR, and unparenthesized it binds
    // as `(correlation AND p1) OR p2` — the correlation lands under a
    // disjunction. DuckDB executes that fine; Spark 4.1.2's
    // RewritePredicateSubquery throws an INTERNAL `None.get` on the
    // NOT EXISTS form (rewriteDomainJoinsIfPresent, subquery.scala:76 —
    // an error-class gap, not an "unsupported" error). The parens keep
    // the correlation conjunctive, which is also the shape's intent.
    s"""SELECT $gExpr AS $gName, count(*) AS n
       |FROM ${lt.name} a
       |WHERE ${neg}EXISTS (SELECT 1 FROM ${rt.name} b
       |              WHERE b.$rc = a.$lc AND (${wherePreds(r, rt, "b")}))
       |GROUP BY 1""".stripMargin
  }

  private def shapeRollup(r: Random, t: T): String = {
    // ROLLUP produces NULL group labels — the subtotal semantics both
    // engines must agree on (incl. the grand-total row).
    //
    // DIALECT TRAP #2 (found by this fuzzer, shapes fz_0075/fz_0526 of
    // seed 20260814 before the guard): over an EMPTY filtered input,
    // DuckDB emits the grand-total `()` grouping-set row with count 0 —
    // the SQL-standard reading, since GROUP BY () over empty input is one
    // row like a bare aggregate — while Spark returns NO rows. The
    // `HAVING count(*) > 0` below is a no-op on non-empty input (every
    // rollup row aggregates ≥1 source row) and removes exactly the
    // divergent empty-input row, so the shape keeps testing the subtotal
    // semantics without tripping the engine gap.
    val (s1, _) = pick(r, t.strs)
    val (s2loop, _) = pick(r, t.strs.filter(_._1 != s1) ++
      t.ints.map(i => (s"${i._1} % ${2 + r.nextInt(4)}", i._1)))
    s"""SELECT $s1 AS g1, $s2loop AS g2, count(*) AS n
       |FROM ${t.name}
       |WHERE ${wherePreds(r, t)}
       |GROUP BY ROLLUP($s1, $s2loop)
       |HAVING count(*) > 0""".stripMargin
  }

  private def shapeStrFns(r: Random, t: T): String = {
    val (s, _) = pick(r, t.strs)
    s"""SELECT upper($s) AS u, substr($s, 1, ${1 + r.nextInt(4)}) AS pfx,
       |       length($s) AS len, count(*) AS n
       |FROM ${t.name}
       |WHERE ${wherePreds(r, t)}
       |GROUP BY 1, 2, 3""".stripMargin
  }

  /** Random numeric scalar-expression tree, every leaf cast to double up
    * front so the whole tree evaluates in IEEE-754 double arithmetic —
    * identical bit-for-bit across engines for the same text (which also
    * sidesteps Spark's ANSI integer-overflow errors on deep int
    * multiplication). Division always guards its denominator with
    * nullif(…, 0.0), so the tree doubles as a NULL-propagation probe:
    * a NULL born deep inside must surface through +,*,abs, CASE and
    * coalesce with the same semantics in both engines.
    *
    * DIALECT TRAP (found by this tier, seed 20260814, 20/1000 shapes at
    * ~1e-6 relative divergence): a bare literal like `-27.9` is DOUBLE in
    * DuckDB but DECIMAL(3,1) in Spark, so a literal-over-literal division
    * runs Spark's DECIMAL division — quotient rounded to the result
    * type's bounded scale — instead of IEEE double division. Literals are
    * therefore emitted in scientific notation (`-27.9e0`), which BOTH
    * engines type as DOUBLE; with every leaf double the whole tree is
    * IEEE arithmetic and compares bit-equal. */
  private def numExpr(r: Random, cols: Seq[String], depth: Int): String = {
    def leaf(): String =
      if (r.nextBoolean()) s"cast(${pick(r, cols)} AS double)"
      else f"${(r.nextInt(4000) - 2000) / 10.0}%.1fe0"
    if (depth <= 0 || r.nextInt(4) == 0) leaf()
    else r.nextInt(7) match {
      case 0 => s"(${numExpr(r, cols, depth - 1)} + ${numExpr(r, cols, depth - 1)})"
      case 1 => s"(${numExpr(r, cols, depth - 1)} - ${numExpr(r, cols, depth - 1)})"
      case 2 => s"(${numExpr(r, cols, depth - 1)} * ${numExpr(r, cols, depth - 1)})"
      case 3 => s"(${numExpr(r, cols, depth - 1)} / nullif(${numExpr(r, cols, depth - 1)}, 0.0))"
      case 4 => s"abs(${numExpr(r, cols, depth - 1)})"
      case 5 =>
        s"CASE WHEN ${numExpr(r, cols, depth - 1)} > ${numExpr(r, cols, depth - 1)} " +
          s"THEN ${numExpr(r, cols, depth - 1)} ELSE ${numExpr(r, cols, depth - 1)} END"
      case _ =>
        s"coalesce(nullif(${numExpr(r, cols, depth - 1)}, ${r.nextInt(50)}.0e0), " +
          s"${numExpr(r, cols, depth - 1)})"
    }
  }

  /** Row-level expression-tree probe: no aggregation, unique-keyed rows, two
    * independent random trees per query. Exercises the scalar evaluator
    * (codegen path) rather than plan shapes — the tier the other 15 shapes
    * don't touch. */
  private def shapeExprTree(r: Random, t: T): String = {
    val uk = t.uniqueKey.get
    val cols = t.ints.map(_._1) ++ t.doubles.map(_._1)
    s"""SELECT $uk AS k,
       |       ${numExpr(r, cols, 2 + r.nextInt(2))} AS e1,
       |       ${numExpr(r, cols, 2 + r.nextInt(2))} AS e2
       |FROM ${t.name}
       |WHERE ${wherePreds(r, t)}""".stripMargin
  }

  /** Date-part grouping probe: extract(year|quarter|month|day) — the
    * portable intersection (dow/doy numbering diverges across engines and
    * stays out, like round(avg) — see the aggs note). */
  private def shapeDateFns(r: Random): String = {
    val t = if (r.nextBoolean()) orders else lineitem
    val c = t.ts.head
    val parts = r.shuffle(Seq("year", "quarter", "month", "day")).take(2)
    val sel = parts.map(p => s"extract($p FROM $c) AS ${p.take(2)}_$c")
    val (mc, mlo, mhi) = pick(r, t.doubles)
    s"""SELECT ${sel.mkString(", ")},
       |       count(*) AS n, round(sum($mc), 2) AS sum_${mc.drop(2)}
       |FROM ${t.name}
       |WHERE ${dblPred(r, mc, mlo, mhi)}
       |GROUP BY 1, 2""".stripMargin
  }

  /** Explicit ROWS/RANGE window frames (VERDICT r12 #4 — the frame
    * vocabulary the original window shape left untouched). ROWS frames are
    * only deterministic under a TOTAL order, so they ORDER BY the unique
    * key; RANGE frames define the frame by VALUE (all peers included), so
    * an int order key with ties is deterministic by construction — which
    * is exactly the semantics difference this tier cross-checks. Bounds
    * stay ≥1 (0 PRECEDING is not in the portable intersection). */
  private def shapeWinFrames(r: Random, t: T): String = {
    val key = t.uniqueKey.get
    val (s, _) = pick(r, t.strs.map(x => (x._1, x._1)) ++
      t.ints.map(i => (s"${i._1} % ${3 + r.nextInt(4)}", i._1)))
    val (d, _, _) = pick(r, t.doubles)
    val a = 1 + r.nextInt(4)
    val b = 1 + r.nextInt(4)
    if (r.nextBoolean())
      s"""SELECT $key AS k,
         |       round(sum($d) OVER (PARTITION BY $s ORDER BY $key
         |         ROWS BETWEEN $a PRECEDING AND $b FOLLOWING), 2) AS fr_sum,
         |       min($d) OVER (PARTITION BY $s ORDER BY $key
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND $b FOLLOWING) AS fr_min
         |FROM ${t.name}
         |WHERE ${wherePreds(r, t)}""".stripMargin
    else {
      val (ic, _) = pick(r, t.ints)
      val w = 1 + r.nextInt(10)
      s"""SELECT $key AS k,
         |       count(*) OVER (ORDER BY $ic
         |         RANGE BETWEEN $w PRECEDING AND $w FOLLOWING) AS fr_n,
         |       max($ic) OVER (ORDER BY $ic
         |         RANGE BETWEEN UNBOUNDED PRECEDING AND $w FOLLOWING) AS fr_mx
         |FROM ${t.name}
         |WHERE ${wherePreds(r, t)}""".stripMargin
    }
  }

  /** INTERSECT ALL / EXCEPT ALL — multiset bag semantics (duplicate
    * counts subtract/min, not collapse), the set-op vocabulary the plain
    * setop shape (UNION/INTERSECT/EXCEPT) doesn't reach. Projections are
    * deliberately non-unique so duplicates actually exist. */
  private def shapeSetopAll(r: Random, t: T): String = {
    val op = if (r.nextBoolean()) "INTERSECT ALL" else "EXCEPT ALL"
    val cols = (t.strs.map(_._1) ++
      t.ints.map(i => s"${i._1} % ${2 + r.nextInt(4)}"))
    val proj = r.shuffle(cols).take(2).zipWithIndex
      .map { case (e, i) => s"$e AS c$i" }.mkString(", ")
    s"""SELECT $proj FROM ${t.name} WHERE ${wherePreds(r, t)}
       |$op
       |SELECT $proj FROM ${t.name} WHERE ${wherePreds(r, t)}""".stripMargin
  }

  /** Correlated scalar subquery in the SELECT list — per-outer-row
    * aggregate over the FK child, the decorrelation path (Spark rewrites
    * to an outer join + aggregate; count must coalesce to 0 on empty,
    * min to NULL — exactly the semantics both engines must agree on).
    * Correlation stays conjunctive and parenthesized (engine trap #4:
    * Spark 4.1.2's RewritePredicateSubquery None.get under a disjunctive
    * correlation — same discipline as shapeExists). */
  private def shapeCorrSelect(r: Random): String = {
    val (lt, lc, rt, rc) = pick(r, joins)
    val key = rt.uniqueKey.get
    val sub =
      if (r.nextBoolean() && lt.doubles.nonEmpty) {
        val (d, _, _) = pick(r, lt.doubles)
        s"""(SELECT min(i.$d) FROM ${lt.name} i
           |        WHERE i.$lc = o.$rc AND (${wherePreds(r, lt, "i")})) AS sub_m"""
      } else
        s"""(SELECT count(*) FROM ${lt.name} i
           |        WHERE i.$lc = o.$rc AND (${wherePreds(r, lt, "i")})) AS sub_n"""
    s"""SELECT o.$key AS k,
       |       ${sub.stripMargin}
       |FROM ${rt.name} o
       |WHERE ${wherePreds(r, rt, "o")}""".stripMargin
  }

  /** Date/interval arithmetic: +INTERVAL n DAY|MONTH shifts (month
    * arithmetic end-of-month clamping must agree), date_trunc bucketing,
    * and an interval-shifted range predicate.
    *
    * DIALECT NOTE (probed before this tier shipped, then refined by its
    * own first run): DuckDB's `date_trunc('month'|'quarter'|'year', ts)`
    * returns DATE while Spark's returns TIMESTAMP — same instant,
    * different type. The bucket is therefore cast to TIMESTAMP on both
    * sides, NOT Date: a Spark-written parquet DATE column loads into the
    * checker's pandas as dtype `object` (python date objects) while
    * DuckDB's DATE arrives as datetime64 — a dtype drift the checker
    * rightly flags even when values agree. TIMESTAMP round-trips as
    * datetime64 from both engines (the same reason every ts column in the
    * corpus compares clean). */
  private def shapeDateArith(r: Random): String = {
    val t = if (r.nextBoolean()) orders else lineitem
    val c = t.ts.head
    val n = 1 + r.nextInt(90)
    val unit = pick(r, Seq("DAY", "MONTH"))
    val part = pick(r, Seq("month", "quarter", "year"))
    s"""SELECT cast(date_trunc('$part', $c + INTERVAL $n $unit) AS TIMESTAMP) AS bucket,
       |       count(*) AS n, min($c) AS first_ts
       |FROM ${t.name}
       |WHERE ${wherePreds(r, t)}
       |  AND $c + INTERVAL $n $unit < TIMESTAMP '2000-06-01 00:00:00'
       |GROUP BY 1""".stripMargin
  }

  /** Random string-function composition tree over the portable
    * intersection (upper/lower/substr/concat/replace/trim/reverse/lpad —
    * all probed to agree, incl. lpad TRUNCATION when the target length is
    * below the input's and replace-with-empty, which is '' in both
    * engines, not NULL). Row-level like shapeExprTree: exercises the
    * string evaluator, not plan shapes. */
  private def strExpr(r: Random, col: String, depth: Int): String = {
    def leaf(): String =
      if (r.nextInt(3) == 0) s"'${pick(r, Seq("xy", "Ab3", "_q", "##", "zz9"))}'"
      else col
    if (depth <= 0 || r.nextInt(5) == 0) leaf()
    else r.nextInt(8) match {
      case 0 => s"upper(${strExpr(r, col, depth - 1)})"
      case 1 => s"lower(${strExpr(r, col, depth - 1)})"
      case 2 => s"substr(${strExpr(r, col, depth - 1)}, ${1 + r.nextInt(3)}, ${1 + r.nextInt(6)})"
      case 3 => s"concat(${strExpr(r, col, depth - 1)}, ${strExpr(r, col, depth - 1)})"
      case 4 => s"replace(${strExpr(r, col, depth - 1)}, " +
        s"'${pick(r, Seq("a", "e", "1", "N", "#"))}', '${pick(r, Seq("x", "", "9"))}')"
      case 5 => s"trim(${strExpr(r, col, depth - 1)})"
      case 6 => s"reverse(${strExpr(r, col, depth - 1)})"
      case _ => s"lpad(${strExpr(r, col, depth - 1)}, ${1 + r.nextInt(12)}, '#')"
    }
  }

  private def shapeStrCompose(r: Random, t: T): String = {
    val key = t.uniqueKey.get
    val (s, _) = pick(r, t.strs)
    s"""SELECT $key AS k,
       |       ${strExpr(r, s, 2 + r.nextInt(2))} AS s1,
       |       length(${strExpr(r, s, 2)}) AS len1
       |FROM ${t.name}
       |WHERE ${wherePreds(r, t)}""".stripMargin
  }

  /** DISTINCT aggregates — the dedup-inside-aggregation path (Spark plans
    * a two-phase expand/partial distinct; DuckDB a hash distinct) whose
    * results must agree exactly. sum(DISTINCT) stays on ints / int
    * expressions so the sum is exact in both engines, and is cast to
    * BIGINT explicitly: DuckDB's integer sum returns HUGEINT (int128),
    * which lands in the checker's pandas as float64 while Spark's BIGINT
    * arrives as int64 — a dtype drift on the identical values (the same
    * class as the date_trunc trap on shapeDateArith). */
  private def shapeDistinctAgg(r: Random, t: T): String = {
    val (gExpr, gName) = groupCol(r, t)
    val (i1, _) = pick(r, t.ints)
    val (i2, _) = pick(r, t.ints)
    s"""SELECT $gExpr AS $gName, count(*) AS n,
       |       count(DISTINCT $i1) AS nd,
       |       cast(sum(DISTINCT $i2 % ${3 + r.nextInt(7)}) AS BIGINT) AS sd
       |FROM ${t.name}
       |WHERE ${wherePreds(r, t)}
       |GROUP BY 1""".stripMargin
  }

  /** GROUPING SETS — the general grouping-set vocabulary beyond ROLLUP's
    * prefix chain: the (a), (b), (a,b) lattice produces NULL labels on
    * DIFFERENT dimensions per set. Same empty-input guard as shapeRollup
    * (dialect trap #2: DuckDB emits the `()` grand-total row over empty
    * input, Spark doesn't — no `()` set here, but the guard also protects
    * the all-NULL-label sets over empty input for free). */
  private def shapeGroupingSets(r: Random, t: T): String = {
    val (s1, _) = pick(r, t.strs)
    val (s2, _) = pick(r, t.strs.filter(_._1 != s1) ++
      t.ints.map(i => (s"${i._1} % ${2 + r.nextInt(4)}", i._1)))
    val sets = pick(r, Seq(
      s"(($s1), ($s2))",
      s"(($s1), ($s2), ($s1, $s2))",
      s"(($s1, $s2), ($s1))"))
    s"""SELECT $s1 AS g1, $s2 AS g2, count(*) AS n
       |FROM ${t.name}
       |WHERE ${wherePreds(r, t)}
       |GROUP BY GROUPING SETS $sets
       |HAVING count(*) > 0""".stripMargin
  }

  /** HAVING over a join aggregate — post-aggregation filtering where the
    * aggregate input is a filtered FK join (the HAVING predicate must see
    * the POST-join groups in both engines). */
  private def shapeJoinHaving(r: Random): String = {
    val (lt, lc, rt, rc) = pick(r, joins)
    val (gExpr, gName) = if (r.nextBoolean()) groupCol(r, rt, "b")
                         else groupCol(r, lt, "a")
    val (d, _, _) = pick(r, (if (lt.doubles.nonEmpty) lt.doubles
                             else rt.doubles))
    val dp = if (lt.doubles.nonEmpty) s"a.$d" else s"b.$d"
    s"""SELECT $gExpr AS $gName, count(*) AS n, round(sum($dp), 2) AS s
       |FROM ${lt.name} a
       |JOIN ${rt.name} b ON a.$lc = b.$rc
       |WHERE ${wherePreds(r, lt, "a")}
       |GROUP BY 1
       |HAVING count(*) > ${1 + r.nextInt(4)} AND min($dp) > 0.0e0""".stripMargin
  }

  /** LATERAL correlated subquery (VERDICT r13 #3 tier): the comma-LATERAL
    * form both engines parse identically. Two sub-shapes: a correlated
    * AGGREGATE lateral (one row per outer row — the de-correlation both
    * planners must get right) and a correlated projection lateral (scalar
    * arithmetic over outer columns). The outer WHERE keeps the outer side
    * small so the shape stays sub-second at sf0.001 in both engines. */
  private def shapeLateral(r: Random): String = {
    val (lt, lc, rt, rc) = pick(r, joins)
    val key = rt.uniqueKey.get
    if (r.nextBoolean() && lt.doubles.nonEmpty) {
      val (d, _, _) = pick(r, lt.doubles)
      s"""SELECT o.$key AS k, l.agg_v, l.n_in
         |FROM ${rt.name} o,
         |  LATERAL (SELECT round(sum(i.$d), 2) AS agg_v, count(*) AS n_in
         |           FROM ${lt.name} i WHERE i.$lc = o.$rc) l
         |WHERE ${wherePreds(r, rt, "o")}""".stripMargin
    } else {
      val (i1, m) = pick(r, rt.ints)
      s"""SELECT o.$key AS k, x.v1, x.v2
         |FROM ${rt.name} o,
         |  LATERAL (SELECT o.$i1 + ${1 + r.nextInt(9)} AS v1,
         |                  o.$i1 % ${2 + r.nextInt(5)} AS v2) x
         |WHERE o.$i1 < ${1 + r.nextInt(m)}""".stripMargin
    }
  }

  /** Windowed aggregates OVER A JOIN (VERDICT r13 #3 tier): the window
    * input is a filtered FK join, so partition boundaries are post-join
    * groups — the geometry where a planner that reorders the join under
    * the window (or prunes a column the frame needs) diverges. Total
    * ORDER BY inside the frame (unique composite) keeps running sums
    * deterministic in both engines. */
  private def shapeWinOverJoin(r: Random): String = {
    val (lt, lc, rt, rc) = pick(r, joins.filter(_._1.doubles.nonEmpty))
    val (d, _, _) = pick(r, lt.doubles)
    val (gExpr, gName) = groupCol(r, rt, "b")
    // EVERY int column of the left table rides in the intra-frame ORDER BY,
    // and the SUMMED column itself is the final tiebreak. DIALECT TRAP
    // (found by this tier, seed 555001 shape fz_0893, 1/1000): the
    // synthetic lineitem carries 1161 duplicate (l_orderkey, l_linenumber)
    // pairs — the "primary key" is NOT unique in this data, and one
    // duplicate even shares all four int columns while differing in
    // l_discount (0.03 vs 0.08), so engines ordered the tied prefix
    // differently and the running sum diverged mid-partition by exactly
    // that 0.05. Ordering by the summed value last makes tied rows
    // value-identical, so every prefix sum is well-defined no matter how
    // either engine breaks the residual tie.
    val keyCols = lt.ints.map(c => s"a.${c._1}").mkString(", ")
    if (r.nextBoolean())
      s"""SELECT $gExpr AS $gName,
         |       round(sum(a.$d) OVER (PARTITION BY $gExpr
         |         ORDER BY $keyCols, a.$d
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS rsum
         |FROM ${lt.name} a
         |JOIN ${rt.name} b ON a.$lc = b.$rc
         |WHERE ${wherePreds(r, lt, "a")}""".stripMargin
    else
      s"""SELECT g, rk, nv FROM (
         |  SELECT $gExpr AS g,
         |         rank() OVER (PARTITION BY $gExpr
         |           ORDER BY round(a.$d, 2) DESC, $keyCols) AS rk,
         |         count(*) OVER (PARTITION BY $gExpr) AS nv
         |  FROM ${lt.name} a
         |  JOIN ${rt.name} b ON a.$lc = b.$rc
         |  WHERE ${wherePreds(r, lt, "a")}) x
         |WHERE rk <= ${1 + r.nextInt(3)}""".stripMargin
  }

  /** FILTER-clause aggregates over a join (replacing the planned
    * UNION-BY-NAME tier: Spark 4.1's SQL parser rejects `UNION ALL BY
    * NAME` — probed round 14, PARSE_SYNTAX_ERROR — so that semantics
    * stays a DataFrame-level surface, s_union_by_name). Per-aggregate
    * FILTER predicates over a filtered FK join: each aggregate sees a
    * DIFFERENT subset of the same groups — the conditional-aggregation
    * shape where engines disagree on empty-subset results (count→0 but
    * sum/min→NULL) if either mishandles the clause. */
  private def shapeFilterAgg(r: Random): String = {
    val (lt, lc, rt, rc) = pick(r, joins.filter(_._1.doubles.nonEmpty))
    val (gExpr, gName) = groupCol(r, rt, "b")
    val (d, _, _) = pick(r, lt.doubles)
    val p1 = anyPred(r, lt, "a")
    val p2 = anyPred(r, lt, "a")
    s"""SELECT $gExpr AS $gName, count(*) AS n,
       |       count(*) FILTER (WHERE $p1) AS n_f,
       |       round(sum(a.$d) FILTER (WHERE $p2), 2) AS s_f,
       |       min(a.$d) FILTER (WHERE $p1) AS m_f
       |FROM ${lt.name} a
       |JOIN ${rt.name} b ON a.$lc = b.$rc
       |WHERE ${wherePreds(r, rt, "b")}
       |GROUP BY 1""".stripMargin
  }

  // ------------------------------------------- round-15 tiers (VERDICT #5)
  /** PIVOT as a FROM clause — the standard Snowflake/SQL-Server spelling
    * both engines parse identically (g_pivot covers the DataFrame
    * operator; this sweeps value-list size, measure, group expr and
    * filters). Doubles are rounded in the OUTER select: neither engine
    * accepts a non-aggregate wrapper inside the PIVOT agg, and rounding
    * the pivoted cells keeps the compare summation-order-insensitive. */
  private def shapePivot(r: Random, t: T): String = {
    val (vCol, vals) = pick(r, t.strs)
    val chosen = r.shuffle(vals).take(2 + r.nextInt(2))
    val (d, _, _) = pick(r, t.doubles)
    val (gExpr, gName) = groupCol(r, t)
    val aliased = chosen.zipWithIndex.map { case (v, i) => s"'$v' AS v$i" }
    val outer = chosen.indices.map(i => s"round(v$i, 2) AS v$i")
    s"""SELECT $gName, ${outer.mkString(", ")}
       |FROM (
       |  SELECT $gExpr AS $gName, $vCol AS pv, $d AS m
       |  FROM ${t.name}
       |  WHERE ${wherePreds(r, t)}
       |) PIVOT (sum(m) FOR pv IN (${aliased.mkString(", ")}))""".stripMargin
  }

  /** UNPIVOT as a FROM clause (melt): both engines exclude NULL cells by
    * default, but the inner select rounds non-null measures so the
    * default never engages — the sweep tests the melt, not null policy
    * (u_unnest/u_unpivot cover the operator; this sweeps measure pairs,
    * filters and the int→double cast leg). */
  private def shapeUnpivot(r: Random, t: T): String = {
    val key = t.uniqueKey.get
    val (d, _, _) = pick(r, t.doubles)
    val (i, _) = pick(r, t.ints)
    val ms = r.shuffle(Seq(s"round($d, 2)", s"CAST($i AS DOUBLE)"))
      .zipWithIndex.map { case (e, j) => s"$e AS m$j" }
    s"""SELECT $key, met, val FROM (
       |  SELECT $key, ${ms.mkString(", ")}
       |  FROM ${t.name}
       |  WHERE ${wherePreds(r, t)}
       |) UNPIVOT (val FOR met IN (m0, m1))""".stripMargin
  }

  /** WITH RECURSIVE — identical text in both engines (Spark 4 executes
    * recursive CTEs natively; cte_recursive is the single hand entry,
    * this sweeps depth, step, the series-joined-to-data leg and the
    * pure-arithmetic accumulation leg). Depths stay ≤100 (Spark's
    * cteRecursionLevelLimit default); integer aggregates are CAST to
    * BIGINT on both sides (DuckDB widens sum(int) to HUGEINT, which
    * pandas reads as float — the cast keeps dtype kinds aligned). */
  private def shapeRecCte(r: Random): String = {
    val k = 4 + r.nextInt(24)
    val step = 1 + r.nextInt(3)
    r.nextInt(3) match {
      case 0 =>
        val t = pick(r, Seq(orders, customer, part))
        val key = t.uniqueKey.get
        s"""WITH RECURSIVE r(n) AS (
           |  SELECT 0
           |  UNION ALL
           |  SELECT n + $step FROM r WHERE n + $step <= $k
           |)
           |SELECT r.n AS n, count(t.$key) AS cnt
           |FROM r LEFT JOIN ${t.name} t ON t.$key % ${k + 1} = r.n
           |GROUP BY r.n""".stripMargin
      case 1 =>
        s"""WITH RECURSIVE r(n, acc) AS (
           |  SELECT 1, 1
           |  UNION ALL
           |  SELECT n + 1, acc + n + 1 FROM r WHERE n < $k
           |)
           |SELECT n, acc FROM r""".stripMargin
      case _ =>
        val cap = 1 << (2 + r.nextInt(8))
        s"""WITH RECURSIVE r(n) AS (
           |  SELECT 1 UNION ALL SELECT n * 2 FROM r WHERE n * 2 <= $cap
           |)
           |SELECT count(*) AS c, CAST(sum(n) AS BIGINT) AS s,
           |       min(n) AS lo, max(n) AS hi FROM r""".stripMargin
    }
  }

  /** SELECT * EXCLUDE/EXCEPT + ORDER BY ALL / GROUP BY ALL — the two
    * round-14-found reference surfaces (select.slt:1212, order.slt:1383).
    * DuckDB runs the NATIVE spelling; Spark runs graft's documented
    * desugaring (explicit column expansion; ALL → the projected list in
    * order with ASC NULLS LAST / DESC NULLS FIRST to match DuckDB's null
    * placement). LIMIT makes ORDER BY ALL load-bearing (the row-sorting
    * compare would otherwise mask it); the unique key leads the projected
    * list, so the ALL ordering is total and the page deterministic. */
  /** Divergent-spelling calendar tier (round 15, follows the f_datetime2
    * gate entry): add_months / months_between / next_day / last_day /
    * weekofyear / dayofweek swept over random month offsets (±24 — crosses
    * year and end-of-month clamp boundaries), random weekday targets and
    * random months_between anchors. The DuckDB side spells each via the
    * emulations the f_datetime2 oracle proved: single-step to_months
    * addition (a chained +years+months clamps differently on leap days),
    * the 31-day fraction with a never-last-day anchor (day 15 — keeps the
    * both-last-days rule out of reach, so the fraction CASE is total), the
    * strictly-after next_day CASE over DuckDB's 0=Sunday dayofweek, week()
    * for ISO weeks, and the +1 Sunday shift. */
  private def shapeCalendar(r: Random): (String, String) = {
    val k = r.nextInt(49) - 24
    val (dname, dnum) = pick(r, Seq(("SUN", 0), ("MON", 1), ("TUE", 2),
      ("WED", 3), ("THU", 4), ("FRI", 5), ("SAT", 6)))
    val am = 1 + r.nextInt(12)
    val anchor = f"1996-$am%02d-15"
    val lim = 40 + r.nextInt(160)
    val spark =
      s"""SELECT o_orderkey,
         |  add_months(CAST(o_orderdate AS DATE), $k) AS am,
         |  round(months_between(DATE '$anchor',
         |        CAST(o_orderdate AS DATE)), 6) AS mb,
         |  next_day(CAST(o_orderdate AS DATE), '$dname') AS nd,
         |  last_day(CAST(o_orderdate AS DATE)) AS ld,
         |  CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INT) AS woy,
         |  CAST(dayofweek(CAST(o_orderdate AS DATE)) AS INT) AS dow
         |FROM orders ORDER BY o_orderkey LIMIT $lim""".stripMargin
    val duck =
      s"""SELECT o_orderkey,
         |  CAST(od + to_months($k) AS DATE) AS am,
         |  round(CAST((1996 - extract(year FROM od)) * 12
         |             + ($am - extract(month FROM od)) AS DOUBLE)
         |        + CASE WHEN extract(day FROM od) = 15 THEN 0.0
         |               ELSE (15 - extract(day FROM od)) / 31.0 END, 6) AS mb,
         |  od + CAST(CASE WHEN (($dnum - dayofweek(od)) % 7 + 7) % 7 = 0 THEN 7
         |                 ELSE (($dnum - dayofweek(od)) % 7 + 7) % 7
         |            END AS INTEGER) AS nd,
         |  last_day(od) AS ld,
         |  CAST(week(od) AS INTEGER) AS woy,
         |  CAST(dayofweek(od) + 1 AS INTEGER) AS dow
         |FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od FROM orders)
         |ORDER BY o_orderkey LIMIT $lim""".stripMargin
    (spark, duck)
  }

  private def shapeExclude(r: Random, t: T): (String, String) = {
    val key = t.uniqueKey.get
    if (r.nextBoolean()) {
      // wildcard-exclusion over a pinned subquery column set
      val (d, _, _) = pick(r, t.doubles)
      val (i, mx) = pick(r, t.ints)
      val cols = Seq("a" -> key, "b" -> s"round($d, 2)",
        "c" -> s"$i % ${2 + r.nextInt(5)}", "d" -> s"$i + ${r.nextInt(7)}")
      val base = s"SELECT ${cols.map { case (n, e) => s"$e AS $n" }.mkString(", ")}\n" +
        s"  FROM ${t.name} WHERE ${intPred(r, i, mx)}"
      val dropped = r.shuffle(Seq("b", "c", "d")).take(1 + r.nextInt(2)).sorted
      val kept = cols.map(_._1).filterNot(dropped.contains)
      // the reference parses both EXCLUDE and EXCEPT (select.slt:1212-1243)
      // but the DuckDB oracle only parses EXCLUDE — the EXCEPT spelling's
      // desugaring is pinned by the s_wildcard_exclude gate entry instead
      // (r.nextBoolean() still consumed so shape content is spelling-free)
      val spelling = { r.nextBoolean(); "EXCLUDE" }
      val desc = r.nextBoolean()
      // DuckDB's default null order is direction-independent (NULLS LAST
      // even under DESC), while the desugar follows the reference's DESC
      // NULLS FIRST — spell the placement on the DuckDB side so the pair
      // stays value-aligned the day a swept column is nullable
      val dir = if (desc) "DESC NULLS FIRST" else ""
      val sparkDir = if (desc) "DESC NULLS FIRST" else "ASC NULLS LAST"
      val lim = 3 + r.nextInt(9)
      val oracle =
        s"""SELECT * $spelling (${dropped.mkString(", ")}) FROM (
           |$base) q ORDER BY ALL $dir LIMIT $lim""".stripMargin
      val spark =
        s"""SELECT ${kept.mkString(", ")} FROM (
           |$base) q ORDER BY ${kept.map(c => s"$c $sparkDir").mkString(", ")}
           |LIMIT $lim""".stripMargin
      (spark, oracle)
    } else {
      // GROUP BY ALL + ORDER BY ALL over an aggregate (g_all's pairing)
      val (gExpr, gName) = groupCol(r, t)
      val (d, _, _) = pick(r, t.doubles)
      val lim = 3 + r.nextInt(9)
      val select = s"SELECT $gExpr AS $gName, count(*) AS n, " +
        s"round(sum($d), 2) AS s\nFROM ${t.name} WHERE ${wherePreds(r, t)}"
      val oracle = s"$select\nGROUP BY ALL ORDER BY ALL LIMIT $lim"
      // GROUP BY ALL is Spark-native; ORDER BY ALL is not — desugar it
      val spark = s"$select\nGROUP BY ALL ORDER BY $gName ASC NULLS LAST, " +
        s"n ASC NULLS LAST, s ASC NULLS LAST LIMIT $lim"
      (spark, oracle)
    }
  }

  /** Pattern-gated dim joins (round 16, VERDICT r15 #8): a LIKE / NOT
    * LIKE-gated dim joined to the fact — the geometry the
    * measured-placement optimizer lane rewrites (MeasuredDimPlacement's
    * sink/hint, and FilterEstimation's no-selectivity blind spot) — plus,
    * half the time, a SECOND role of the same fact on the hub key (the
    * FactMergeGuard linearization geometry). The texts are fully
    * ANSI-portable, so the tier runs in BOTH legs: the DuckDB
    * differential proves any rewritten plan still returns the portable
    * answer, and FuzzSpec's CBO-differential leg (which picks up every
    * join-bearing shape, and lowers FactMergeGuard's fact/role floors to
    * spec scale so the guard's rewrite actually fires at fuzz data size —
    * ADVICE r16) proves rule-ON ≡ rule-OFF row identity over ANALYZE'd
    * catalog tables. */
  private def shapePatternDimJoin(r: Random): String = {
    // patterns built from substrings of the shared part vocabulary so a
    // healthy fraction of rows match (p_type: ECONOMY/PROMO/STANDARD…,
    // p_name: "adj noun" off the adjective/noun lists)
    val (dimCol, pat) = pick(r, Seq(
      ("p.p_type", "'%OM%'"), ("p.p_type", "'PRO%'"), ("p.p_type", "'%ARD'"),
      ("p.p_name", "'%o%'"), ("p.p_name", "'%ge%'"), ("p.p_name", "'%red%'")))
    val neg = if (r.nextBoolean()) "NOT " else ""
    val second = r.nextBoolean()
    val l2Join =
      if (second) "\nJOIN lineitem l2 ON l.l_orderkey = l2.l_orderkey" else ""
    val l2Pred =
      if (second) s" AND l2.l_quantity > ${1 + r.nextInt(40)}.0" else ""
    val factPred = s" AND l.l_extendedprice < ${40000 + r.nextInt(60000)}.0"
    s"""SELECT round(sum(l.l_extendedprice), 2) AS rev, count(*) AS cnt
       |FROM lineitem l
       |JOIN part p ON l.l_partkey = p.p_partkey$l2Join
       |WHERE $neg$dimCol LIKE $pat$factPred$l2Pred""".stripMargin
  }

  /** Window functions with EXPLICIT frames over OUTER-join results (round
    * 17, VERDICT r16 #6): the 33 prior tiers exercise outer joins and
    * framed windows separately; composing them puts join-produced NULLs
    * INSIDE the frames — the classic cross-engine trap is a RANGE frame
    * whose ORDER BY key is NULL on unmatched rows (ANSI: the nulls form
    * one peer group that is its own frame, and no non-null row's offset
    * frame contains them). Three variants:
    *  - ROWS frame over a LEFT join, aggregating the null-bearing right
    *    column (null rows contribute nothing to sum, everything to
    *    count(*)) — order fully determined by the left unique key;
    *  - RANGE frame ORDERED BY the null-bearing right column with an
    *    explicit NULLS FIRST/LAST — only order-insensitive aggregates
    *    (sum/count/min/max), so tie order inside a peer group is moot;
    *  - ROWS running aggregates over a FULL join of two filtered
    *    projections (NULLs possible on BOTH sides; the coalesced key is
    *    unique, so the order is total).
    * Identical text both engines — any divergence is a real bug or a
    * pinned dialect split, not formatting. */
  private def shapeWinOverOuter(r: Random): String = {
    val (lt, lc, rt, rc) = pick(r, joins.filter(_._1.uniqueKey.isDefined))
    val key = lt.uniqueKey.get
    // the right side is pre-filtered in a derived table (a WHERE outside
    // would re-inner the join), so unmatched left rows carry NULL b.*
    val (rv, isDbl) = {
      val opts = rt.doubles.map(d => (d._1, true)) ++
        rt.ints.map(i => (i._1, false))
      pick(r, opts)
    }
    val derived =
      s"""(SELECT $rc AS rk, $rv AS rv FROM ${rt.name}
         |           WHERE ${wherePreds(r, rt)}) b ON a.$lc = b.rk""".stripMargin
    r.nextInt(3) match {
      case 0 =>
        val (n0, m0) = (1 + r.nextInt(4), 1 + r.nextInt(4))
        // DIALECT: DuckDB promotes ANY integer sum to HUGEINT (pandas
        // float64) while Spark stays int64 — found by fresh region
        // 424242017, 5/1000, all this spelling. An explicit DOUBLE cast
        // makes both engines sum doubles (exact here: key-sized ints over
        // ≤9-row frames); the double case just rounds.
        val sumExpr =
          if (isDbl) "round(sum(b.rv) OVER w1, 2)"
          else "sum(CAST(b.rv AS DOUBLE)) OVER w1"
        s"""SELECT a.$key AS k, $sumExpr AS fr_sum,
           |       count(b.rk) OVER (ORDER BY a.$key
           |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fr_m,
           |       count(*) OVER w1 AS fr_n
           |FROM ${lt.name} a
           |LEFT JOIN $derived
           |WHERE ${wherePreds(r, lt, "a")}
           |WINDOW w1 AS (ORDER BY a.$key
           |  ROWS BETWEEN $n0 PRECEDING AND $m0 FOLLOWING)""".stripMargin
      case 1 =>
        val w = 1 + r.nextInt(8)
        val nulls = if (r.nextBoolean()) "NULLS FIRST" else "NULLS LAST"
        val mx = if (isDbl) "round(max(b.rv) OVER w2, 2)" else "max(b.rv) OVER w2"
        s"""SELECT a.$key AS k, count(*) OVER w2 AS fr_n, $mx AS fr_mx
           |FROM ${lt.name} a
           |LEFT JOIN $derived
           |WHERE ${wherePreds(r, lt, "a")}
           |WINDOW w2 AS (ORDER BY b.rv ASC $nulls
           |  RANGE BETWEEN $w PRECEDING AND $w FOLLOWING)""".stripMargin
      case _ =>
        // FULL join of two filtered projections of one keyed table
        val t = pick(r, Seq(orders, customer, part, supplier))
        val k2 = t.uniqueKey.get
        val (d, _, _) = pick(r, t.doubles)
        val (a0, b0) = (1 + r.nextInt(3), 1 + r.nextInt(3))
        s"""SELECT coalesce(x.k, y.k) AS k,
           |       count(x.k) OVER (ORDER BY coalesce(x.k, y.k)
           |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rx,
           |       round(sum(y.vb) OVER (ORDER BY coalesce(x.k, y.k)
           |         ROWS BETWEEN $a0 PRECEDING AND $b0 FOLLOWING), 2) AS wy
           |FROM (SELECT $k2 AS k, $d AS va FROM ${t.name}
           |      WHERE ${wherePreds(r, t)}) x
           |FULL JOIN (SELECT $k2 AS k, $d AS vb FROM ${t.name}
           |           WHERE ${wherePreds(r, t)}) y ON x.k = y.k""".stripMargin
    }
  }

  // --------------------------------------------------------------- generate
  /** `n` deterministic queries for `seed`. Pure: no I/O, no global state. */
  def generate(seed: Long, n: Int): Seq[Q] = {
    val r = new Random(seed)
    val withStrs = tables.filter(_.strs.nonEmpty)
    val withDbls = tables.filter(_.doubles.nonEmpty)
    val fullable = Seq(orders, customer, part, supplier)
    val keyedStrs = tables.filter(t => t.uniqueKey.isDefined && t.strs.nonEmpty)
    val keyedDbls = tables.filter(t =>
      t.uniqueKey.isDefined && t.doubles.nonEmpty && t.ints.nonEmpty)
    val keyedDblInt = Seq(orders, customer, part, supplier)
    (0 until n).map { i =>
      var oracle: Option[String] = None
      val sql = r.nextInt(35) match {
        case 0 => shapeAgg(r, pick(r, withDbls))
        case 1 => shapeDistinct(r, pick(r, withStrs))
        case 2 => shapeJoinAgg(r)
        case 3 => shapeThreeJoin(r)
        case 4 => shapeWindow(r)
        case 5 => shapeSetop(r, pick(r, withStrs))
        case 6 => shapeInSub(r)
        case 7 => shapeScalarSub(r, pick(r, withDbls))
        case 8 => shapeCase(r, pick(r, withDbls))
        case 9 => shapeLeftJoin(r)
        case 10 => shapeFullJoin(r, pick(r, fullable))
        case 11 => shapeCte(r, pick(r, withDbls))
        case 12 => shapeExists(r)
        case 13 => shapeRollup(r, pick(r, withStrs))
        case 14 => shapeExprTree(r, pick(r, tables.filter(t =>
          t.uniqueKey.isDefined && t.doubles.nonEmpty)))
        case 15 => shapeDateFns(r)
        case 16 => shapeWinFrames(r, pick(r, keyedDbls))
        case 17 => shapeSetopAll(r, pick(r, withStrs))
        case 18 => shapeCorrSelect(r)
        case 19 => shapeDateArith(r)
        case 20 => shapeStrCompose(r, pick(r, keyedStrs))
        case 21 => shapeDistinctAgg(r, pick(r, withStrs.filter(_.ints.size >= 2)))
        case 22 => shapeGroupingSets(r, pick(r, withStrs))
        case 23 => shapeJoinHaving(r)
        case 24 => shapeLateral(r)
        case 25 => shapeWinOverJoin(r)
        case 26 => shapeFilterAgg(r)
        case 27 => if (r.nextBoolean()) shapePage(r)
                   else shapeStrFns(r, pick(r, withStrs))
        case 28 => shapePivot(r, pick(r,
          Seq(orders, customer, part, lineitem)))
        case 29 => shapeUnpivot(r, pick(r, keyedDblInt))
        case 30 => shapeRecCte(r)
        case 31 =>
          val (s, o) = shapeCalendar(r)
          oracle = Some(o); s
        case 32 => shapePatternDimJoin(r)
        case 33 => shapeWinOverOuter(r)
        case _ =>
          val (s, o) = shapeExclude(r, pick(r, keyedDblInt))
          oracle = Some(o); s
      }
      Q(f"fz_$i%04d", sql, oracle)
    }
  }
}
