package graft

import graft.functions.HashFns

/** Generators for DuckDB oracle-SQL fragments that must match the Spark
  * implementations bit-for-bit. Constants (minhash coefficients, geohash
  * scaling, derived-coordinate formulas) live in ONE place — here and
  * [[graft.functions.HashFns]] — and are string-interpolated into the SQL,
  * so Spark and the oracle can never drift apart silently.
  */
object OracleSql {

  /** Derived deterministic NYC-box coordinates from an integer key
    * (testdata has no lat/lon; see SURVEY §3). IEEE-identical in both
    * engines: bigint modulo → multiply by double → add double.
    */
  def latSql(key: String): String = s"40.4 + ($key % 593) * 0.001::DOUBLE"
  def lonSql(key: String): String = s"-74.3 + ($key % 599) * 0.001::DOUBLE"

  /** 32-bit md5-prefix hash (DuckDB side of HashFns.hash32). */
  def hash32Sql(x: String): String = s"('0x' || substr(md5($x), 1, 8))::BIGINT"

  /** 60-bit md5-prefix hash (DuckDB side of HashFns.hash60). */
  def hash60Sql(x: String): String = s"('0x' || substr(md5($x), 1, 15))::BIGINT"

  def normTextSql(c: String): String = s"trim(regexp_replace($c, '\\s+', ' ', 'g'))"

  /** Unrolled Durbin–Levinson recursion for PACF(1..maxLag) from ACF
    * columns r1..r<maxLag>: returns (columnName, sqlExpr) steps, each
    * expression referencing only earlier columns. The SAME strings feed
    * Spark's `expr` and the DuckDB oracle (valid in both dialects:
    * doubles, CASE WHEN, arithmetic), so the double expression TREES —
    * and therefore the IEEE results — cannot drift apart.
    * φ_kk = (r_k − Σ_{j<k} φ_{k−1,j}·r_{k−j}) / E_{k−1},
    * φ_kj = φ_{k−1,j} − φ_kk·φ_{k−1,k−j}, E_k = E_{k−1}·(1 − φ_kk²);
    * a non-positive prediction error (degenerate/perfectly-predictable
    * series) yields NULL from that order on.
    */
  def levinsonSteps(maxLag: Int): Seq[(String, String)] = {
    val steps = Seq.newBuilder[(String, String)]
    steps += ("p_1_1" -> "r1")
    steps += ("e_1" -> "CAST(1.0 AS DOUBLE) - p_1_1 * p_1_1")
    for (k <- 2 to maxLag) {
      val acc = (1 until k).map(j => s"p_${k - 1}_$j * r${k - j}")
        .mkString(" + ")
      steps += (s"p_${k}_$k" ->
        s"CASE WHEN e_${k - 1} > 0 THEN (r$k - ($acc)) / e_${k - 1} END")
      for (j <- 1 until k)
        steps += (s"p_${k}_$j" ->
          s"p_${k - 1}_$j - p_${k}_$k * p_${k - 1}_${k - j}")
      steps += (s"e_$k" ->
        s"e_${k - 1} * (CAST(1.0 AS DOUBLE) - p_${k}_$k * p_${k}_$k)")
    }
    steps.result()
  }

  /** Geohash precision-7: closed-form floor scaling + morton interleave
    * (lon first), base32. Emitted as a SELECT-list fragment chain using
    * DuckDB lateral column aliases; `latExpr`/`lonExpr` are SQL doubles.
    * Produces columns `<prefix>_gh` (the 7-char geohash); intermediates are
    * prefixed to avoid collisions.
    */
  def geohashCols(latExpr: String, lonExpr: String, p: String = "g"): String = {
    // part1by1 spread: 18-bit (lon) / 17-bit (lat) into alternating bits.
    val masks = Seq(
      16 -> "281470681808895",     // 0x0000FFFF0000FFFF
      8  -> "71777214294589695",   // 0x00FF00FF00FF00FF
      4  -> "1085102592571150095", // 0x0F0F0F0F0F0F0F0F
      2  -> "3689348814741910323", // 0x3333333333333333
      1  -> "6148914691236517205") // 0x5555555555555555
    def spreadSteps(in: String, out: String): String =
      masks.zipWithIndex.map { case ((sh, m), i) =>
        val prev = if (i == 0) in else s"${out}_$i"
        val name = if (i == masks.size - 1) out else s"${out}_${i + 1}"
        s"((($prev) | (($prev) << $sh)) & $m) AS $name"
      }.mkString(", ")
    val latb = s"CAST(LEAST(GREATEST(FLOOR(((($latExpr) + 90.0) / 180.0) * 131072.0), 0), 131071) AS BIGINT)"
    val lonb = s"CAST(LEAST(GREATEST(FLOOR(((($lonExpr) + 180.0) / 360.0) * 262144.0), 0), 262143) AS BIGINT)"
    val chars = (0 until 7).map { i =>
      s"substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(((${p}_ih >> ${30 - 5 * i}) & 31) + 1 AS INT), 1)"
    }.mkString(" || ")
    s"""$latb AS ${p}_latb, $lonb AS ${p}_lonb,
       |${spreadSteps(s"${p}_lonb", s"${p}_sx")},
       |${spreadSteps(s"${p}_latb", s"${p}_sy")},
       |(${p}_sx | (${p}_sy << 1)) AS ${p}_ih,
       |$chars AS ${p}_gh""".stripMargin.replace("\n", " ")
  }

  /** MinHash h_i over a column of 32-bit shingle hashes (same (a,b,P) as
    * HashFns): `min((a_i*x + b_i) % P)` aggregate fragments.
    */
  def minhashAggSql(xCol: String): Seq[String] =
    (0 until HashFns.MinhashK).map { i =>
      s"min((${HashFns.minhashA(i)} * $xCol + ${HashFns.minhashB(i)}) % ${HashFns.MinhashP}) AS h$i"
    }

  /** LSH band keys from minhash columns h0..h{K-1}: Bands keys of Rows
    * concatenated values.
    */
  def bandKeySql(band: Int): String =
    (0 until HashFns.MinhashRows)
      .map(r => s"h${band * HashFns.MinhashRows + r}::VARCHAR")
      .mkString(" || ':' || ")
}
