package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.mr.TestSession
import graft.queries.Relational

class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct is within 2% of exact (HLL path)") {
    val li = Tables.lineitem(spark, sf)
    val (approx, exact) = li
      .agg(approx_count_distinct($"l_partkey", 0.01).as("a"), countDistinct($"l_partkey").as("e"))
      .as[(Long, Long)].head()
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr < 0.02, s"approx=$approx exact=$exact relErr=$relErr")
  }

  test("approx quantiles are within the requested relative error of exact") {
    val li = Tables.lineitem(spark, sf)
    val approx = li.stat.approxQuantile("l_extendedprice", Array(0.25, 0.5, 0.75), 0.01)
    val n = li.count()
    val sorted = li.select($"l_extendedprice").orderBy($"l_extendedprice")
      .as[Double].collect()
    Seq(0.25, 0.5, 0.75).zip(approx).foreach { case (q, a) =>
      // the sketch guarantees rank error <= eps*n
      val lo = sorted(math.max(0, (q * n - 0.02 * n).toInt))
      val hi = sorted(math.min(n - 1, (q * n + 0.02 * n).toLong).toInt)
      assert(a >= lo && a <= hi, s"q$q: $a outside [$lo, $hi]")
    }
  }

  test("hash sampling is deterministic and roughly 10%") {
    val s1 = Relational.hashSample(spark, sf).collect().map(_.getLong(0)).toSet
    val s2 = Relational.hashSample(spark, sf).collect().map(_.getLong(0)).toSet
    assert(s1 == s2) // stable across runs — rand() sampling is not
    val total = Tables.orders(spark, sf).count()
    val frac = s1.size.toDouble / total
    assert(frac > 0.05 && frac < 0.15, s"sampled $frac")
  }

  test("salted aggregate equals the plain aggregate") {
    val salted = Relational.saltedAgg(spark, sf)
      .as[(String, Double, Long)].collect().toSet
    val plain = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(sum($"l_quantity".cast("decimal(38,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .as[(String, Double, Long)].collect().toSet
    assert(salted == plain) // salting is a pure physical rewrite
  }

  test("discrete median picks an existing value at the lower-median rank") {
    val med = Relational.discreteMedian(spark, sf).collect()
    assert(med.nonEmpty)
    val quantities = Tables.lineitem(spark, sf)
      .select($"l_quantity").distinct().as[Double].collect().toSet
    med.foreach(r => assert(quantities.contains(r.getDouble(1))))
  }

  test("events loader yields the same UTC instants under any session timezone") {
    // ADVICE r11: the MICROS branch's NTZ->timestamp cast was session-TZ
    // dependent. The loader now builds the cast under a scoped UTC pin
    // (frozen into the plan at analysis), so the loaded INSTANTS must be
    // identical no matter what TZ the caller's session carries — and the
    // caller's timezone setting must survive the call untouched.
    val utcVals = Tables.events(spark, sf)
      .select($"ts".cast("long")).as[Long].orderBy($"ts").collect().toSeq
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val nycVals = Tables.events(spark, sf)
        .select($"ts".cast("long")).as[Long].orderBy($"ts").collect().toSeq
      assert(nycVals == utcVals, "events instants shifted with session timezone")
      assert(spark.conf.get("spark.sql.session.timeZone") == "America/New_York",
        "loader must restore the caller's timezone")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("asof join matches each event to its user's latest prior order") {
    val got = Relational.asofJoin(spark, sf)
    assert(got.count() == Tables.events(spark, sf).count())
    // cross-check one user against a direct computation
    val u0 = got.filter($"user_id" === 0).select($"last_orderkey").distinct()
      .as[Long].collect().toSet
    val expect = Tables.orders(spark, sf).filter($"o_custkey" === 0)
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc).limit(1)
      .select($"o_orderkey").as[Long].collect().toSet
    assert(u0 == expect, s"got $u0 expected $expect")
  }
}
