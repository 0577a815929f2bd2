package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Training-data pipeline text operators over the `documents` table:
 * deduplication (exact, n-gram Jaccard, MinHash+LSH, SimHash), language-ID,
 * quality scoring, token counting, and document fingerprinting.
 *
 * All transforms are Catalyst HOFs over word arrays — no UDFs (the
 * reference's discipline: every transform is a Column combinator,
 * /root/reference/spark/lib/utils.py:74-103 — kept so the hot path stays in
 * whole-stage codegen). md5 is the cross-engine hash (DuckDB has no
 * xxhash64); the engine-internal paths use xxhash64.
 *
 * Scale shapes: dedup candidate generation is blocked (rare-shingle
 * filtering / LSH banding) so pair blowup is bounded by posting-list
 * length, not O(n²); everything else is embarrassingly parallel per row.
 */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private val ws = split(col("text"), " ")

  /** distinct bigram shingles ALREADY HASHED to xxhash64 longs (d02's hot
    * path — round 6): hashing the word pair directly inside the transform
    * replaces building the bigram STRING, array_distinct over strings, and
    * a post-explode rehash. `xxhash64(w1, w2)` (chained seeding) is
    * injective on word pairs exactly as the hash of the joined string was
    * on bigrams (words contain no separator, so pair ↔ string is 1:1);
    * the hash values never reach the output — only pair identity matters —
    * and the accepted 64-bit collision risk is unchanged (VERDICT r1
    * next-step 7).
    *
    * Takes the word array as an ALREADY-MATERIALIZED column: HOFs are
    * CodegenFallback, so a `split(...)` subtree inside the lambda body is
    * re-evaluated interpreted on EVERY element (no common-subexpression
    * elimination reaches inside) — measured ~2 s of d02's wall at sf0.1
    * just re-splitting the text twice per bigram.
    *
    * Guarded for sub-2-word docs: `sequence(1, size-1)` is NEVER empty —
    * for a 1-word doc it DESCENDS to [1, 0] and element_at(w, 0) is an
    * error — so such docs short-circuit to an empty shingle set, which is
    * exactly what the oracle's `range(1, len)` (empty when len=1)
    * computes. */
  private def bigramHashesOf(w: Column): Column =
    when(size(w) >= 2,
      array_distinct(
        transform(sequence(lit(1), size(w) - 1),
          i => xxhash64(element_at(w, i), element_at(w, i + 1)))))
      .otherwise(array().cast("array<bigint>"))

  /** default LSH bucket-size cap: generous for genuine near-dup clusters,
    * a hard bound on join blowup (pairs per bucket <= cap²/2) */
  val lshBucketCap = 1000

  /** MinHash+LSH candidate pairs with a bucket-size skew guard — exposed
    * for the adversarial-corpus spec (constant-text input must stay
    * bounded instead of going quadratic).
    *
    * Round-6 shape (guide §2.4 — remove duplicate evaluation, not just
    * shuffles): the 6-signature md5 pipeline is the entire cost, and the
    * old two-projection union evaluated it once per band while the
    * bucket-size guard and the two self-join sides re-evaluated the whole
    * subtree again each (the before-plan shows 6 copies of the signature
    * scan). Now (a) `array_distinct(ws)` is computed once in its own
    * projection and shared by all 6 signatures (CollapseProject keeps a
    * non-cheap alias referenced 6× materialized), (b) both bands leave one
    * row via a single explode instead of a 2-way union, and (c) the tiny
    * (doc_id, bkt, band) bucket table is cached for the guard + both join
    * sides — an intra-query intermediate recomputed from parquet on every
    * invocation, nothing persists across runs. */
  def minhashLshPairs(docsDf: DataFrame, bucketCap: Int): DataFrame = {
    // all 6 salted signatures in ONE pass over the distinct-word array
    // (graft.functions.MinhashSigs, codegen'd): the 6 separate
    // array_min(transform(md5...)) HOF folds re-walked the array per salt
    // and built 6 intermediate hex-string arrays per doc — equivalence is
    // spec-pinned (MinhashSigSpec) and oracle-verified
    val d = docsDf
      .select(col("doc_id"),
        graft.functions.MinhashSigs.of(array_distinct(ws), 6).as("sg"))
      .select(
        col("doc_id"),
        md5(concat_ws("|", col("sg").getItem(0), col("sg").getItem(1),
          col("sg").getItem(2))).as("band1"),
        md5(concat_ws("|", col("sg").getItem(3), col("sg").getItem(4),
          col("sg").getItem(5))).as("band2"))
    val all = d.select(col("doc_id"), explode(array(
        struct(col("band1").as("bkt"), lit(1L).as("band")),
        struct(col("band2").as("bkt"), lit(2L).as("band")))).as("e"))
      .select(col("doc_id"), col("e.bkt").as("bkt"), col("e.band").as("band"))
      .cache()
    val small = all.groupBy("bkt", "band").agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= bucketCap).drop("bn")
    val capped = all.join(small, Seq("bkt", "band"))
    val l = capped.select(col("bkt"), col("band"), col("doc_id").as("a"))
    val r = capped.select(col("bkt").as("bkt_r"), col("band").as("band_r"),
      col("doc_id").as("b"))
    l.join(r, col("bkt") === col("bkt_r") && col("band") === col("band_r") &&
        col("a") < col("b"))
      .select("a", "b", "band").distinct()
      .orderBy("a", "b", "band")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // exact dedup: survivors = one per distinct text hash (group-min rule)
    "d01_dedup_exact" -> ((s, dir) => {
      docs(s, dir)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_distinct_text"),
          min(col("doc_id")).as("first_doc"))
        .orderBy("source")
    }),

    // n-gram Jaccard near-dup: candidate pairs via rare-shingle postings
    // (df <= 20 blocks the pair blowup), scored by |∩|/|A∪B| over bigram
    // sets; deterministic total order. Shingles are shuffled as xxhash64
    // LONGS (16 bytes/row), never as strings — the oracle can't see the
    // keys (only doc pairs + scores appear in the output) and a 64-bit
    // collision over ~10^6 shingles is ~10^-8 (VERDICT r1 next-step 7).
    //
    // Shape: ONE pass over the heavy shingle pipeline → postings group
    // by shingle in a single exchange; `BoundedCollect.list(_, 21)` caps
    // a hot shingle's aggregation buffer at 21 elements (a boilerplate
    // shingle in 10^9 docs at 100 TB costs O(21), not an executor OOM)
    // while the same-pass count(*) keeps the TRUE df, so `df <= 20`
    // both applies the rarity filter and proves the kept lists are
    // complete. Pairs then expand from each <=20-element list with
    // codegen'd array HOFs and re-aggregate by pair — replacing the
    // df-join + aliased self-join that recomputed the shingle pipeline
    // three times and shuffled full postings twice more.
    "d02_dedup_ngram_jaccard" -> ((s, dir) => {
      // cache() is a predicate-pushdown BARRIER, not a reuse cache: the
      // explode below makes InferFiltersFromGenerate add
      // `size(sh)>0 && isnotnull(sh)` and pushdown substitutes the FULL
      // shingle expression into a scan-level Filter (twice per row, with
      // the lambda re-splitting per element — measured ~2 s at sf0.1).
      // Behind the cache the inferred filter tests the materialized
      // attribute. Intra-query only; recomputed from parquet every run.
      val d = docs(s, dir)
        .select(col("doc_id"), col("lang"), ws.as("w"))
        .select(col("doc_id"), col("lang"), bigramHashesOf(col("w")).as("sh"))
        .withColumn("nsh", size(col("sh")).cast("long"))
        .cache()
      val posts = d.select(col("doc_id"), col("nsh"), col("lang"),
          explode(col("sh")).as("gh"))
      // df is counted per shingle ACROSS langs (oracle semantics); lang
      // equality applies only at pair time
      val grouped = posts.groupBy("gh").agg(
          graft.functions.BoundedCollect.list(
            struct(col("doc_id"), col("nsh"), col("lang")), 21).as("ds"),
          count(lit(1)).as("df"))
        .filter(col("df") <= 20 && col("df") >= 2)
      // element i partners with every LATER element of the same lang;
      // (a,b) normalized by doc_id order (slice is 1-based: i+2 skips
      // self and predecessors)
      val pairs = grouped.select(explode(flatten(
          transform(col("ds"), (x, i) =>
            filter(
              transform(slice(col("ds"), i + lit(2), size(col("ds"))), y =>
                struct(
                  when(x("doc_id") < y("doc_id"), x("doc_id"))
                    .otherwise(y("doc_id")).as("a"),
                  when(x("doc_id") < y("doc_id"), y("doc_id"))
                    .otherwise(x("doc_id")).as("b"),
                  when(x("doc_id") < y("doc_id"), x("nsh"))
                    .otherwise(y("nsh")).as("na"),
                  when(x("doc_id") < y("doc_id"), y("nsh"))
                    .otherwise(x("nsh")).as("nb"),
                  (x("lang") === y("lang")).as("same"))),
              p => p("same"))))).as("pr"))
        .select(col("pr.a").as("a"), col("pr.b").as("b"),
          col("pr.na").as("na"), col("pr.nb").as("nb"))
      pairs.groupBy("a", "b", "na", "nb")
        .agg(count(lit(1)).as("inter"))
        .withColumn("jacc",
          col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
        .filter(col("jacc") >= 0.002)
        .select(col("a"), col("b"), col("jacc"))
        .orderBy(desc("jacc"), asc("a"), asc("b"))
        .limit(100)
    }),

    // MinHash + LSH banding: 6 hash funcs over the distinct word set,
    // 2 bands of 3 → docs sharing a band are near-dup candidates.
    // SKEW GUARD (VERDICT r1 next-step 6): a degenerate bucket (boilerplate
    // corpora collapse many docs into one band) makes the self-join
    // quadratic — buckets above `lshBucketCap` members are excluded from
    // pair generation (mirrored exactly in the oracle, and at 100 TB the
    // right behavior: a 10^6-member bucket is boilerplate, not near-dups).
    "d03_dedup_minhash_lsh" -> ((s, dir) =>
      minhashLshPairs(docs(s, dir), lshBucketCap)),

    // SimHash: 16-bit signature from per-word md5 nibbles (bit i = sign of
    // Σ ±1 over words, + when hex digit i of md5(word) >= '8').
    // The word-hash array and word count are materialized ONCE per row:
    // HOFs are CodegenFallback, so each of the 16 bit expressions used to
    // re-evaluate the whole split+md5 subtree inside its filter (16×54
    // md5s per row instead of 54).
    "d04_dedup_simhash" -> ((s, dir) => {
      val bits = (1 to 16).map { i =>
        when(size(filter(col("hs"), h => substring(h, i, 1) >= "8")) * 2 -
          col("n") > 0, "1").otherwise("0")
      }
      docs(s, dir)
        .select(col("doc_id"), transform(ws, w => md5(w)).as("hs"),
          size(ws).as("n"))
        .select(col("doc_id"), concat(bits: _*).as("simhash"))
        .orderBy("doc_id")
    }),

    // language-ID: stopword-occurrence scores via the replace trick
    // (identical cross-engine, no regex dialects), argmax with fixed
    // priority tiebreak en > es > zh
    "t01_language_id" -> ((s, dir) => {
      def occ(w: String): Column =
        (length(concat(lit(" "), col("text"), lit(" "))) -
          length(expr(s"replace(concat(' ', text, ' '), ' $w ', '')")))
      val sEn = (occ("the") + occ("a") + occ("value")).as("s_en")
      val sEs = (occ("data") + occ("row") + occ("join")).as("s_es")
      val sZh = (occ("table") + occ("scan") + occ("merge")).as("s_zh")
      docs(s, dir)
        .withColumn("s_en", sEn).withColumn("s_es", sEs).withColumn("s_zh", sZh)
        .withColumn("predicted",
          when(col("s_en") >= col("s_es") && col("s_en") >= col("s_zh"), "en")
            .when(col("s_es") >= col("s_zh"), "es")
            .otherwise("zh"))
        .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")
    }),

    // quality scoring: length / distinct-ratio / stopword-density features,
    // integer-exact (x1000 fixed-point via integer division). The word
    // array is split once per row and shared by the four feature
    // expressions (each HOF subtree re-evaluated its own split before).
    "t02_quality_score" -> ((s, dir) => {
      val w = col("w")
      val nW = size(w).cast("long")
      val sumLen = aggregate(transform(w, x => length(x).cast("long")),
        lit(0L), (acc, x) => acc + x)
      val nDist = size(array_distinct(w)).cast("long")
      val stops = size(filter(w,
        x => x.isin("the", "a", "data", "value", "row"))).cast("long")
      docs(s, dir)
        .select(col("doc_id"), ws.as("w"), col("n_chars"))
        .select(
          col("doc_id"),
          nW.as("n_words"),
          expr("CAST(n_chars AS BIGINT)").as("n_chars_l"),
          sumLen.as("sum_wlen"),
          (nDist * 1000L).divide(nW).cast("long").as("distinct_x1000"),
          (stops * 1000L).divide(nW).cast("long").as("stop_x1000"))
        .orderBy("doc_id")
    }),

    // token counting: whitespace words + a BPE-ish regex segmentation
    "t03_token_count" -> ((s, dir) => {
      val bpe = size(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")
      docs(s, dir)
        .withColumn("n_ws_tokens", size(ws).cast("long"))
        .withColumn("n_bpe_tokens", bpe)
        .groupBy("source")
        .agg(sum(col("n_ws_tokens")).as("sum_ws"),
          sum(col("n_bpe_tokens")).as("sum_bpe"),
          max(col("n_bpe_tokens")).as("max_bpe"),
          count(lit(1)).as("n_docs"))
        .orderBy("source")
    }),

    // document fingerprinting: full-text hash + min/max word-hash sketch
    // (minhash-1) + head-of-document rolling piece. The word-hash array is
    // materialized once and shared by min and max (each used to
    // re-evaluate the whole split+distinct+md5 subtree).
    "t04_fingerprint" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"),
          md5(col("text")).as("fp_full"),
          transform(array_distinct(ws), w => md5(w)).as("hw"),
          md5(concat_ws(" ", slice(ws, 1, 8))).as("fp_head"))
        .select(
          col("doc_id"),
          col("fp_full"),
          array_min(col("hw")).as("fp_min"),
          array_max(col("hw")).as("fp_max"),
          col("fp_head"))
        .orderBy("doc_id")
    }))

  val oracle: Map[String, String] = Map(
    "d01_dedup_exact" ->
      """SELECT source, count(*) AS n_docs,
        |  count(DISTINCT md5(text)) AS n_distinct_text,
        |  min(doc_id) AS first_doc
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "d02_dedup_ngram_jaccard" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    list_distinct(list_transform(range(1, len(string_split(text,' '))),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS sh
        |  FROM documents),
        |posts AS (
        |  SELECT doc_id, lang, CAST(len(sh) AS BIGINT) AS nsh, unnest(sh) AS g FROM d),
        |rare AS (
        |  SELECT g FROM posts GROUP BY g HAVING count(*) <= 20 AND count(*) >= 2),
        |p AS (SELECT posts.* FROM posts JOIN rare USING (g)),
        |pairs AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, x.nsh AS na, y.nsh AS nb,
        |    count(*) AS inter
        |  FROM p x JOIN p y ON x.g = y.g AND x.lang = y.lang
        |    AND x.doc_id < y.doc_id
        |  GROUP BY 1,2,3,4)
        |SELECT a, b, CAST(inter AS DOUBLE) / (na + nb - inter) AS jacc
        |FROM pairs WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.002
        |ORDER BY jacc DESC, a ASC, b ASC LIMIT 100""".stripMargin,
    "d03_dedup_minhash_lsh" ->
      """WITH sigs AS (
        |  SELECT doc_id,
        |    md5(concat_ws('|',
        |      list_aggregate(list_transform(list_distinct(string_split(text,' ')), w -> md5('0:' || w)), 'min'),
        |      list_aggregate(list_transform(list_distinct(string_split(text,' ')), w -> md5('1:' || w)), 'min'),
        |      list_aggregate(list_transform(list_distinct(string_split(text,' ')), w -> md5('2:' || w)), 'min'))) AS band1,
        |    md5(concat_ws('|',
        |      list_aggregate(list_transform(list_distinct(string_split(text,' ')), w -> md5('3:' || w)), 'min'),
        |      list_aggregate(list_transform(list_distinct(string_split(text,' ')), w -> md5('4:' || w)), 'min'),
        |      list_aggregate(list_transform(list_distinct(string_split(text,' ')), w -> md5('5:' || w)), 'min'))) AS band2
        |  FROM documents),
        |buckets0 AS (
        |  SELECT doc_id, band1 AS bkt, CAST(1 AS BIGINT) AS band FROM sigs
        |  UNION ALL
        |  SELECT doc_id, band2 AS bkt, CAST(2 AS BIGINT) AS band FROM sigs),
        |small AS (
        |  SELECT bkt, band FROM buckets0 GROUP BY bkt, band
        |  HAVING count(*) <= 1000),
        |buckets AS (
        |  SELECT buckets0.* FROM buckets0 JOIN small USING (bkt, band))
        |SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.band AS band
        |FROM buckets x JOIN buckets y
        |  ON x.bkt = y.bkt AND x.band = y.band AND x.doc_id < y.doc_id
        |ORDER BY a, b, band""".stripMargin,
    "d04_dedup_simhash" -> {
      val bits = (1 to 16).map { i =>
        s"CASE WHEN 2*len(list_filter(list_transform(string_split(text,' '), w -> md5(w)), h -> substr(h,$i,1) >= '8')) - len(string_split(text,' ')) > 0 THEN '1' ELSE '0' END"
      }.mkString(" || ")
      s"""SELECT doc_id, $bits AS simhash
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "t01_language_id" -> {
      def occ(w: String) =
        s"(length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' $w ', '')))"
      s"""WITH scored AS (
         |  SELECT lang,
         |    ${occ("the")} + ${occ("a")} + ${occ("value")} AS s_en,
         |    ${occ("data")} + ${occ("row")} + ${occ("join")} AS s_es,
         |    ${occ("table")} + ${occ("scan")} + ${occ("merge")} AS s_zh
         |  FROM documents)
         |SELECT lang,
         |  CASE WHEN s_en >= s_es AND s_en >= s_zh THEN 'en'
         |       WHEN s_es >= s_zh THEN 'es' ELSE 'zh' END AS predicted,
         |  count(*) AS n
         |FROM scored GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin
    },
    "t02_quality_score" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
        |  CAST(n_chars AS BIGINT) AS n_chars_l,
        |  CAST(list_aggregate(list_transform(string_split(text,' '), w -> length(w)), 'sum') AS BIGINT) AS sum_wlen,
        |  CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) * 1000
        |    // len(string_split(text,' ')) AS distinct_x1000,
        |  CAST(len(list_filter(string_split(text,' '),
        |    w -> w IN ('the','a','data','value','row'))) AS BIGINT) * 1000
        |    // len(string_split(text,' ')) AS stop_x1000
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t03_token_count" ->
      """SELECT source,
        |  CAST(sum(len(string_split(text,' '))) AS BIGINT) AS sum_ws,
        |  CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS sum_bpe,
        |  CAST(max(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS max_bpe,
        |  count(*) AS n_docs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "t04_fingerprint" ->
      """SELECT doc_id,
        |  md5(text) AS fp_full,
        |  list_aggregate(list_transform(list_distinct(string_split(text,' ')), w -> md5(w)), 'min') AS fp_min,
        |  list_aggregate(list_transform(list_distinct(string_split(text,' ')), w -> md5(w)), 'max') AS fp_max,
        |  md5(array_to_string(string_split(text,' ')[1:8], ' ')) AS fp_head
        |FROM documents ORDER BY doc_id""".stripMargin)
}
