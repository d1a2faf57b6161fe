package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sketches.{FrequentDirections, GramAccumulator}

/**
 * Matrix sketches: the exact one-pass Gram aggregate and the
 * Frequent-Directions sketch — facade-level math (Jacobi eigen, FD
 * spectral-error guarantee, merge associativity, wire round-trip) and
 * the SQL lifecycle (vec_gram_agg / fd_accumulate / fd_combine /
 * fd_gram_estimate / fd_singular_values / fd_error_bound).
 */
class MatrixSketchSuite extends AnyFunSuite with GraftSparkSession {

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def randRows(n: Int, d: Int, seed: Long): Array[Array[Double]] = {
    val r = rng(seed)
    Array.fill(n)(Array.fill(d)(r.nextGaussian()))
  }

  private def exactGram(rows: Array[Array[Double]], d: Int): Array[Double] = {
    val g = new Array[Double](d * d)
    rows.foreach { v =>
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { g(i * d + j) += v(i) * v(j); j += 1 }
        i += 1
      }
    }
    g
  }

  // spectral norm of a symmetric matrix via power iteration
  private def specNorm(m: Array[Double], d: Int): Double = {
    var x = Array.fill(d)(1.0 / math.sqrt(d))
    var lam = 0.0
    for (_ <- 1 to 200) {
      val y = new Array[Double](d)
      var i = 0
      while (i < d) {
        var s = 0.0
        var j = 0
        while (j < d) { s += m(i * d + j) * x(j); j += 1 }
        y(i) = s
        i += 1
      }
      lam = math.sqrt(y.map(v => v * v).sum)
      if (lam > 0) x = y.map(_ / lam)
    }
    lam
  }

  test("GramAccumulator: exact, order-independent, merge = concat") {
    val d = 8
    val rows = randRows(100, d, 1L)
    val all = GramAccumulator.create(d)
    rows.foreach(all.update)
    val g = all.gram
    val expected = exactGram(rows, d)
    g.zip(expected).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }

    val (h1, h2) = rows.splitAt(37)
    val a1 = GramAccumulator.create(d)
    val a2 = GramAccumulator.create(d)
    h1.foreach(a1.update)
    h2.foreach(a2.update)
    a1.merge(a2)
    a1.gram.zip(g).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    assert(a1.count === 100)

    // wire round-trip is bit-exact against the accumulator it serialized
    val rt = GramAccumulator.fromBytes(a1.toBytes)
    assert(rt.count === 100)
    rt.gram.zip(a1.gram).foreach { case (a, b) => assert(a === b) }
  }

  test("Jacobi eigen: recovers a known spectrum") {
    // diag(5, 2, 1) conjugated by a rotation
    val c = math.cos(0.7); val s = math.sin(0.7)
    // A = R * diag(5,2,1) * R' with R rotating dims (0,1)
    val a = Array(
      5 * c * c + 2 * s * s, (5 - 2) * c * s, 0.0,
      (5 - 2) * c * s, 5 * s * s + 2 * c * c, 0.0,
      0.0, 0.0, 1.0)
    val (eig, _) = FrequentDirections.symEigen(a, 3)
    val sorted = eig.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-8)
    assert(math.abs(sorted(1) - 2.0) < 1e-8)
    assert(math.abs(sorted(2) - 5.0) < 1e-8)
  }

  test("FD: spectral error within the ||A||_F^2 / ell guarantee") {
    val d = 16
    val ell = 8
    val rows = randRows(400, d, 2L)
    val fd = FrequentDirections.create(ell, d)
    rows.foreach(fd.update)
    val exact = exactGram(rows, d)
    val approx = fd.gram
    val diff = exact.zip(approx).map { case (a, b) => a - b }
    val bound = fd.frobeniusSquared / ell
    assert(specNorm(diff, d) <= bound + 1e-6,
      s"spectral error ${specNorm(diff, d)} exceeds FD bound $bound")
    // FD only ever UNDER-estimates quadratic forms: x'(A'A - B'B)x >= 0;
    // check on the coordinate axes (diagonal entries)
    (0 until d).foreach { i =>
      assert(diff(i * d + i) >= -1e-9)
    }
  }

  test("FD: near-exact on low-rank input") {
    val d = 12
    val ell = 6
    val r = rng(3L)
    // rank-2 stream: combinations of two fixed directions
    val u = Array.fill(d)(r.nextGaussian())
    val w = Array.fill(d)(r.nextGaussian())
    val rows = Array.fill(300) {
      val a = r.nextGaussian(); val b = 0.3 * r.nextGaussian()
      u.zip(w).map { case (ui, wi) => a * ui + b * wi }
    }
    val fd = FrequentDirections.create(ell, d)
    rows.foreach(fd.update)
    val exact = exactGram(rows, d)
    val diff = exact.zip(fd.gram).map { case (a, b) => a - b }
    // rank 2 << ell: shrink discards almost nothing
    assert(specNorm(diff, d) <= 0.05 * specNorm(exact, d))
    val sv = fd.squaredSingularValues
    assert(sv(0) >= sv(1) && sv(1) > sv(2))
    assert(sv(2) <= 0.05 * sv(1)) // third energy is noise
  }

  test("FD: merge preserves the guarantee and the Frobenius ledger") {
    val d = 10
    val ell = 8
    val rows = randRows(500, d, 4L)
    val (h1, h2) = rows.splitAt(200)
    val f1 = FrequentDirections.create(ell, d)
    val f2 = FrequentDirections.create(ell, d)
    h1.foreach(f1.update)
    h2.foreach(f2.update)
    // serialize across the "shuffle" like the aggregate does
    val m = FrequentDirections.fromBytes(f1.toBytes)
    m.merge(FrequentDirections.fromBytes(f2.toBytes))
    val exact = exactGram(rows, d)
    val diff = exact.zip(m.gram).map { case (a, b) => a - b }
    assert(specNorm(diff, d) <= m.frobeniusSquared / ell + 1e-6)
    val totalFrob = rows.map(_.map(x => x * x).sum).sum
    assert(math.abs(m.frobeniusSquared - totalFrob) < 1e-6)
  }

  test("SQL: vec_gram_agg matches a brute-force explode") {
    import spark.implicits._
    val d = 4
    val rows = randRows(50, d, 5L).toSeq.map(_.toSeq)
    rows.toDF("v").createOrReplaceTempView("gram_vals")
    val g = spark.sql("SELECT vec_gram_agg(v) g FROM gram_vals")
      .collect()(0).getSeq[Double](0)
    assert(g.length === d * d)
    val brute = spark.sql("""
      |SELECT ai.pos i, bi.pos j, sum(ai.col * bi.col) s
      |FROM gram_vals LATERAL VIEW posexplode(v) ai LATERAL VIEW posexplode(v) bi
      |GROUP BY 1, 2""".stripMargin).collect()
    brute.foreach { r =>
      assert(math.abs(g(r.getInt(0) * d + r.getInt(1)) - r.getDouble(2)) < 1e-9)
    }
  }

  test("SQL: grouped fd_accumulate rolls up through fd_combine") {
    import spark.implicits._
    val d = 6
    val rows = randRows(300, d, 6L).toSeq.map(_.toSeq).zipWithIndex
    rows.map { case (v, i) => (i % 3, v) }.toDF("g", "v")
      .createOrReplaceTempView("fd_vals")
    val r = spark.sql("""
      |SELECT fd_gram_estimate(fd_combine(s)) gram, fd_error_bound(fd_combine(s)) eps
      |FROM (SELECT g, fd_accumulate(v, 12) s FROM fd_vals GROUP BY g)""".stripMargin)
      .collect()(0)
    val gram = r.getSeq[Double](0)
    val eps = r.getDouble(1)
    assert(gram.length === d * d)
    val exact = exactGram(rows.map(_._1.toArray).toArray, d)
    // entrywise deviation is capped by the spectral bound
    gram.zip(exact).foreach { case (b, a) =>
      assert(math.abs(a - b) <= eps + 1e-6)
    }
  }

  test("SQL: fd_singular_values descending; corrupt bytes -> NULL; empty -> NULL") {
    val r = spark.sql("""
      |SELECT fd_singular_values(fd_accumulate(v, 4)) sv
      |FROM VALUES (array(3.0d, 0.0d)), (array(0.0d, 1.0d)) AS tab(v)""".stripMargin)
      .collect()(0).getSeq[Double](0)
    assert(r.length === 4)
    assert(math.abs(r(0) - 9.0) < 1e-9 && math.abs(r(1) - 1.0) < 1e-9)
    val bad = spark.sql(
      "SELECT fd_gram_estimate(CAST('junk' AS BINARY)), fd_error_bound(CAST('x' AS BINARY))")
      .collect()(0)
    assert(bad.isNullAt(0) && bad.isNullAt(1))
    val empty = spark.sql(
      "SELECT vec_gram_agg(v), fd_accumulate(v, 4) FROM VALUES (array(1.0d)) t(v) WHERE false")
      .collect()(0)
    assert(empty.isNullAt(0) && empty.isNullAt(1))
  }

  test("SQL: fd_accumulate rejects a non-constant or tiny ell") {
    val e1 = intercept[Exception] {
      spark.sql("SELECT fd_accumulate(array(1.0d), 1) FROM VALUES (1) t(x)").collect()
    }
    assert(e1.getMessage.contains("ell"))
  }

  test("SQL: one-arg fd_accumulate freezes ell from the session conf") {
    withSQLConf("spark.sql.dataSketches.fd.ell" -> "4") {
      val sv = spark.sql(
        "SELECT fd_singular_values(fd_accumulate(v)) FROM VALUES (array(1.0d, 0.0d)) t(v)")
        .collect()(0).getSeq[Double](0)
      assert(sv.length === 4) // padded to the conf'd ell
    }
    // default ell = 16
    val svd = spark.sql(
      "SELECT fd_singular_values(fd_accumulate(v)) FROM VALUES (array(1.0d, 0.0d)) t(v)")
      .collect()(0).getSeq[Double](0)
    assert(svd.length === 16)
    // bad conf values rejected at SET time
    val e = intercept[Exception] {
      spark.conf.set("spark.sql.dataSketches.fd.ell", "1")
    }
    assert(e.getMessage.contains("ell"))
  }

  test("property: FD bound, monotone trace, and merge-order invariance hold " +
    "across random shapes") {
    // randomized (n, d, ell, data) sweeps with fixed seeds — the FD
    // guarantee is a theorem, so EVERY draw must satisfy it exactly
    for (caseId <- 0 until 12) {
      val r = rng(100L + caseId)
      val d = 2 + r.nextInt(12)
      val ell = 2 + r.nextInt(6)
      val n = 1 + r.nextInt(300)
      val scale = math.pow(10, r.nextInt(5) - 2)
      val rows = Array.fill(n)(Array.fill(d)(scale * r.nextGaussian()))
      val fd = FrequentDirections.create(ell, d)
      rows.foreach(fd.update)
      val exact = exactGram(rows, d)
      val diff = exact.zip(fd.gram).map { case (a, b) => a - b }
      val bound = fd.frobeniusSquared / ell
      assert(specNorm(diff, d) <= bound * (1 + 1e-9) + 1e-12,
        s"case $caseId: n=$n d=$d ell=$ell")
      // under-estimation: diagonal of the deficit never negative
      (0 until d).foreach(i => assert(diff(i * d + i) >= -1e-6 * bound - 1e-12))
      // merge-order invariance of the GUARANTEE (not of the bytes): any
      // split must still satisfy the bound with the summed ledger
      val cut = r.nextInt(n + 1)
      val (h1, h2) = rows.splitAt(cut)
      val f1 = FrequentDirections.create(ell, d)
      val f2 = FrequentDirections.create(ell, d)
      h1.foreach(f1.update)
      h2.foreach(f2.update)
      f2.merge(f1) // reverse order on purpose
      val diff2 = exact.zip(f2.gram).map { case (a, b) => a - b }
      assert(specNorm(diff2, d) <= f2.frobeniusSquared / ell * (1 + 1e-9) + 1e-12)
      assert(math.abs(f2.frobeniusSquared - fd.frobeniusSquared) <=
        1e-9 * (1 + fd.frobeniusSquared))
    }
  }

  test("Spectral.covarianceN2 matches the definition and is partition-invariant") {
    import spark.implicits._
    val d = 5
    val rows = randRows(80, d, 9L).toSeq.map(_.toSeq)
    val df = rows.toDF("embedding")
    val cov = graft.operators.Spectral.covarianceN2(df, "embedding")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    // brute-force replay on the same lattice
    val q = rows.map(_.map(x => math.round(x * 1000).toDouble))
    val n = q.length.toLong
    def s(i: Int) = q.map(_(i).toLong).sum
    def g(i: Int, j: Int) = q.map(v => v(i).toLong * v(j).toLong).sum
    for { i <- 0 until d; j <- i until d } {
      assert(cov((i, j)) === n * g(i, j) - s(i) * s(j), s"cov($i,$j)")
    }
    val cov9 = graft.operators.Spectral.covarianceN2(df.repartition(9), "embedding")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(cov9 === cov)
  }

  test("Spectral.gramDrift: zero for identical slices, localized for a planted shift") {
    import spark.implicits._
    val d = 4
    val rows = randRows(100, d, 12L).toSeq.map(_.toSeq)
    val df = rows.toDF("embedding")
    // identical slices: every drift entry is exactly zero
    val same = graft.operators.Spectral.gramDrift(df, df, "embedding")
      .collect()
    assert(same.length === d * (d + 1) / 2)
    assert(same.forall(_.getLong(2) === 0L))
    // planted +1.0 on dim 2: drift concentrates in row/col 2
    val shifted = rows.map(v => v.updated(2, v(2) + 1.0)).toDF("embedding")
    val drift = graft.operators.Spectral.gramDrift(df, shifted, "embedding")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val touched = drift.filter { case ((i, j), _) => i == 2 || j == 2 }
    val untouched = drift.filter { case ((i, j), _) => i != 2 && j != 2 }
    assert(touched.values.forall(_ != 0L))
    assert(untouched.values.forall(_ === 0L)) // only dim 2 moved
  }

  test("Spectral.pcaProject recovers a planted dominant direction") {
    import spark.implicits._
    val d = 10
    val r = rng(10L)
    val dir = {
      val raw = Array.fill(d)(r.nextGaussian())
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / nrm)
    }
    // strong rank-1 signal + small isotropic noise
    val rows = Seq.fill(200) {
      val a = 10.0 * r.nextGaussian()
      dir.map(x => a * x + 0.1 * r.nextGaussian()).toSeq
    }
    val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "embedding")
    val (comps, eig, dd) = graft.operators.Spectral.principalComponents(df, "embedding", 2)
    assert(dd === d && eig(0) > 50 * eig(1))
    val align = math.abs(comps(0).zip(dir).map { case (a, b) => a * b }.sum)
    assert(align > 0.999, s"top component misaligned: $align")
    val proj = graft.operators.Spectral.pcaProject(df, "id", "embedding", 2)
    val stats = proj.selectExpr("min(residual_sq)", "max(residual_sq)",
      "sum(proj[0]*proj[0])", "sum(proj[1]*proj[1])").collect()(0)
    assert(stats.getDouble(0) >= -1e-9)
    assert(stats.getDouble(2) > stats.getDouble(3)) // energy ordered
    // residual is only the noise floor: tiny relative to captured energy
    assert(stats.getDouble(1) < 0.05 * eig(0))
  }
}
