package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure Column-expression building blocks for text analysis and dedup —
  * session-free, unit-testable, all Catalyst-native (no Scala UDFs: a UDF
  * here would block pushdown/codegen and serialize every row through the
  * JVM boundary — the SURVEY §4 trap).
  *
  * Portability contract: every function here has an exact DuckDB-SQL
  * equivalent (md5 hex, ASCII-lexicographic string min, integer-exact
  * arithmetic) so the oracle can replay results bit-for-bit.
  *
  * Functions that build nested lambda expressions take the input column
  * NAME (not a Column) and parse via `expr` — the generated SQL is then
  * the literal documentation of what the oracle must mirror.
  */
object TextFunctions {

  /** Whitespace tokens (single-space corpus; mirrors string_split). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word-level 3-gram shingles from a token array column named `w`.
    * Empty for short docs (explicit guard: Spark's `sequence(1,0)` would
    * count DOWN, not return empty).
    */
  def shingles3(w: String): Column =
    expr(s"""CASE WHEN size($w) >= 3
      THEN transform(sequence(1, size($w) - 2),
             i -> concat_ws(' ', $w[i-1], $w[i], $w[i+1]))
      ELSE CAST(array() AS array<string>) END""")

  /** MinHash signature: k md5-seeded minimum shingle hashes over the array
    * column named `sh`, computed PER ROW with higher-order functions — no
    * explode, no shuffle. md5's hex string under lexicographic min acts as
    * a random permutation of the shingle universe; seeds give k independent
    * permutations. O(k·|shingles|) map-side work per document; only the
    * k-string signature ever shuffles.
    */
  def minhashSignatureSql(sh: String, k: Int): Column =
    expr(s"""transform(sequence(0, ${k - 1}),
      h -> array_min(transform($sh, s -> md5(concat(CAST(h AS STRING), '|', s)))))""")

  /** 64-bit SimHash over the shingle-array column named `sh`, as a '0'/'1'
    * string, computed PER ROW: fold shingles into a 64-long bit-vote
    * accumulator (integer-exact, so any fold order — or the oracle's
    * group-sum — yields identical votes), then threshold. Bit j of a
    * shingle = bit (3 - j%4) of hex nibble j/4 of md5(shingle).
    */
  def simhash64Sql(sh: String): Column =
    expr(s"""array_join(transform(
        aggregate(transform($sh, s -> substr(md5(s), 1, 16)),
          transform(sequence(0, 63), j -> 0),
          (acc, hx) -> zip_with(acc,
            transform(sequence(0, 63), j ->
              CASE WHEN ((instr('0123456789abcdef',
                  substr(hx, 1 + CAST(j DIV 4 AS INT), 1)) - 1)
                DIV (CASE CAST(j % 4 AS INT) WHEN 0 THEN 8 WHEN 1 THEN 4
                     WHEN 2 THEN 2 ELSE 1 END)) % 2 = 1 THEN 1 ELSE -1 END),
            (a, b) -> a + b)),
        votes -> CASE WHEN votes > 0 THEN '1' ELSE '0' END), '')""")

  /** Hamming distance between two equal-length ASCII sketch columns —
    * the codegen'd [[graft.plans.HammingDist]] expression (byte-wise
    * compare, no per-pair array allocation; identical results to the
    * split/zip_with/fold form it replaced for the '0'/'1' and hex
    * alphabets the sketch columns use).
    */
  def hammingDist(a: Column, b: Column): Column =
    call_function("graft_hamming", a, b)

  /** Number of stopword tokens ('a', 'the') in a token array. */
  def stopwordCount(w: Column): Column =
    size(filter(w, x => x === "a" || x === "the"))

  /** Order-insensitive document fingerprint: md5 of the sorted token bag. */
  def fingerprintMd5(w: Column): Column =
    md5(array_join(array_sort(w), " "))

  /** Positional polynomial fingerprint: Σ ascii(ch_i)·((i·131) mod 9973),
    * exact long arithmetic → order-independent combining, oracle-identical.
    * (The sequential-rolling-hash capability of the reference inventory,
    * made associative so it distributes.) Computed by the native
    * [[graft.plans.FingerprintPoly]] expression — one tight loop per
    * document instead of a per-char array + HOF fold; TextFunctionsSpec
    * pins parity with the SQL form on the ASCII corpus.
    */
  def fingerprintPoly(text: Column): Column =
    call_function("graft_fppoly", text)

  /** Winnowing fingerprint selection (k=8 char grams, window w=4) —
    * distinct selected hashes sorted ascending. Computed by the native
    * [[graft.plans.WinnowFingerprints]] expression: one tight loop per
    * document instead of a nested HOF (per-window lambda evals dominate
    * the interpreted form). See [[winnowSql]] for the semantics.
    */
  def winnow(text: Column): Column =
    call_function("graft_winnow", text)

  /** The SQL-composed twin of [[winnow]] — kept as the oracle-shaped
    * reference TextFunctionsSpec checks the native expression against:
    * gram hash = first 8 md5 hex chars as unsigned, per-window
    * `array_min` over `slice`, distinct + sort. Fewer than w grams (but
    * ≥ 1) degrade to the global minimum; shorter than k chars → empty.
    */
  def winnowSql(textCol: String): Column = {
    val hashes = s"""transform(sequence(1, length($textCol) - 7),
        i -> CAST(conv(substr(md5(substr($textCol, i, 8)), 1, 8), 16, 10)
                  AS BIGINT))"""
    expr(s"""
      CASE WHEN length($textCol) >= 8 THEN
        CASE WHEN length($textCol) - 7 >= 4 THEN
          array_sort(array_distinct(transform(
            sequence(1, length($textCol) - 7 - 3),
            s -> array_min(slice($hashes, s, 4)))))
        ELSE array(array_min($hashes))
        END
      ELSE CAST(array() AS array<bigint>) END""")
  }

  /** The SQL-composed twin of [[fingerprintPoly]] — kept as the
    * oracle-shaped reference the spec checks the native expression
    * against.
    */
  def fingerprintPolySql(text: Column): Column =
    aggregate(
      transform(split(text, ""),
        (ch, i) => ascii(ch).cast("long") * ((i * 131) % 9973).cast("long")),
      lit(0L), (acc, v) => acc + v)
}
