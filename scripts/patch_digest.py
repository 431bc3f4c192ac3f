#!/usr/bin/env python3
"""One-shot round-10 patch: re-encode the corpusDigest family.

sum_h DECIMAL(38,0) -> sum_h_hi/sum_h_lo BIGINT (divmod 2^62), and
per-cell length-prefix row encoding (fixes separator injection).
The U+001F separator literal in the source can't be typed through the
edit tool, hence this script.
"""
US = '\\u001f'  # the unit-separator escape inside lit(...)

p = 'src/main/scala/graft/ext/Pipeline.scala'
s = open(p, encoding='utf-8').read()

old_body = '''  def corpusDigest(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "corpusDigest needs at least one column")
    val parts = cols.map(c =>
      coalesce(col(c).cast("string"), lit("␀")))
    val joined = parts.reduce((a, b) => concat(a, lit("%s"), b))
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    df.select(portableHash60(joined).as("h"))
      .agg(count(lit(1)).as("n_rows"),
        // empty input: aggregates over zero rows are NULL — report the
        // identity elements instead (the checkConstraints convention)
        coalesce(expr("bit_xor(h)"), lit(0L)).as("xor_h"),
        coalesce(sum(col("h").cast(dec38)), lit(0L).cast(dec38))
          .as("sum_h"))
  }''' % US
assert old_body in s, "corpusDigest body not found"

new_body = '''  /** Row encoding for the digest family: each cell is length-prefixed
    * (`<n_chars>:<value>`; NULL is the bare `␀` token, which cannot
    * collide with a prefixed value because those start with a digit),
    * then cells join on a unit separator. Length prefixes make the
    * joined string uniquely decodable, so distinct row tuples can never
    * concatenate to the same string — ("ab","c") and ("a","bc") now
    * encode differently even under separator injection, and a literal
    * "␀" cell encodes as "1:␀" ≠ NULL's bare "␀". Both Spark and
    * DuckDB `length` count Unicode code points, so the encoding replays
    * byte-identically in the oracle engine.
    */
  private[graft] def digestRowEncoding(cols: Seq[String]): Column = {
    val parts = cols.map { c =>
      val s = col(c).cast("string")
      when(s.isNull, lit("␀"))
        .otherwise(concat(length(s).cast("string"), lit(":"), s))
    }
    parts.reduce((a, b) => concat(a, lit("%s"), b))
  }

  /** 2^62 — the hi/lo split base for the digest sum. The exact sum of
    * 60-bit row hashes exceeds 2^63 at corpus scale (DECIMAL(38,0)
    * internally), but downstream consumers (row hashers, other engines)
    * are BIGINT-safe, so the digest emits the sum as two BIGINTs:
    * `sum_h_hi = sum div 2^62`, `sum_h_lo = sum mod 2^62`. Lossless
    * (hi·2^62 + lo reconstructs the exact sum for any corpus under
    * ~2^63 rows) and still order-independent.
    */
  private[graft] val DigestSplitBase = 4611686018427387904L // 2^62

  def corpusDigest(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "corpusDigest needs at least one column")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    df.select(portableHash60(digestRowEncoding(cols)).as("h"))
      .agg(count(lit(1)).as("n_rows"),
        // empty input: aggregates over zero rows are NULL — report the
        // identity elements instead (the checkConstraints convention)
        coalesce(expr("bit_xor(h)"), lit(0L)).as("xor_h"),
        coalesce(sum(col("h").cast(dec38)), lit(0L).cast(dec38))
          .as("s"))
      .select(col("n_rows"), col("xor_h"),
        expr(s"s div ${DigestSplitBase}L").as("sum_h_hi"),
        pmod(col("s"), lit(DigestSplitBase)).cast("long").as("sum_h_lo"))
  }''' % US
s = s.replace(old_body, new_body)

old_by = '''    require(cols.nonEmpty, "corpusDigestBy needs at least one column")
    val parts = cols.map(c =>
      coalesce(col(c).cast("string"), lit("␀")))
    val joined = parts.reduce((a, b) => concat(a, lit("%s"), b))
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    df.select(col(byCol), portableHash60(joined).as("h"))
      .groupBy(col(byCol))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("xor_h"),
        sum(col("h").cast(dec38)).as("sum_h"))
  }''' % US
assert old_by in s, "corpusDigestBy body not found"
new_by = '''    require(cols.nonEmpty, "corpusDigestBy needs at least one column")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    df.select(col(byCol), portableHash60(digestRowEncoding(cols)).as("h"))
      .groupBy(col(byCol))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("xor_h"),
        sum(col("h").cast(dec38)).as("s"))
      .select(col(byCol), col("n_rows"), col("xor_h"),
        expr(s"s div ${DigestSplitBase}L").as("sum_h_hi"),
        pmod(col("s"), lit(DigestSplitBase)).cast("long").as("sum_h_lo"))
  }'''
s = s.replace(old_by, new_by)

old_diff = '''    def side(df: DataFrame, tag: String) = df.select(col(byCol),
      col("n_rows").as(s"${tag}_n"), col("xor_h").as(s"${tag}_x"),
      col("sum_h").as(s"${tag}_s"))
    side(prev, "p").join(side(next, "n"), Seq(byCol), "full_outer")
      .select(col(byCol),
        when(col("p_n").isNull, lit("added"))
          .when(col("n_n").isNull, lit("removed"))
          .when(col("p_n") === col("n_n") && col("p_x") === col("n_x") &&
                col("p_s") === col("n_s"), lit("same"))'''
assert old_diff in s, "digestDiff body not found"
new_diff = '''    def side(df: DataFrame, tag: String) = df.select(col(byCol),
      col("n_rows").as(s"${tag}_n"), col("xor_h").as(s"${tag}_x"),
      col("sum_h_hi").as(s"${tag}_sh"), col("sum_h_lo").as(s"${tag}_sl"))
    side(prev, "p").join(side(next, "n"), Seq(byCol), "full_outer")
      .select(col(byCol),
        when(col("p_n").isNull, lit("added"))
          .when(col("n_n").isNull, lit("removed"))
          .when(col("p_n") === col("n_n") && col("p_x") === col("n_x") &&
                col("p_sh") === col("n_sh") && col("p_sl") === col("n_sl"),
            lit("same"))'''
s = s.replace(old_diff, new_diff)

s = s.replace('''(n_rows, xor_h, sum_h): the count, bit-XOR, and exact DECIMAL(38,0)
    * sum of the portable 60-bit row hash over `cols` (unit-separator
    * joined; NULL cells map to a ␀ sentinel so (NULL) and ('') digest
    * differently). All three aggregates''',
  '''(n_rows, xor_h, sum_h_hi, sum_h_lo): the count, bit-XOR, and exact
    * sum of the portable 60-bit row hash over `cols` (length-prefixed
    * cell encoding — see [[digestRowEncoding]] — so distinct rows can
    * never alias, and NULL ≠ '' ≠ "␀"; the sum is exact DECIMAL(38,0)
    * internally, emitted as BIGINT hi/lo divmod 2^62). All aggregates''')
s = s.replace('''map-side combine reduces every partition to three
    * numbers''', '''map-side combine reduces every partition to four
    * numbers''')
s = s.replace('''Spark
    * keeps the three commutative partials as state (three numbers,''',
  '''Spark
    * keeps the commutative partials as state (a handful of numbers,''')

open(p, 'w', encoding='utf-8').write(s)
print("patched Pipeline.scala OK")
