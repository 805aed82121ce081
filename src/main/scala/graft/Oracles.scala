package graft

/** DuckDB-dialect oracle SQL for every SQL-expressible query in [[Queries]].
  * Table names are the bare parquet basenames (the driver registers each
  * `<sfDir>/<name>.parquet` as a view).
  *
  * Dialect correspondence notes:
  *  - integer SUM/len/row_number are BIGINT-aligned on both sides
  *    (DuckDB SUM(int)→HUGEINT is always cast to BIGINT here);
  *  - money sums go through DECIMAL(18,2) → DOUBLE (exact both engines);
  *  - per-row double math rounded to 6 dp in both dialects.
  */
object Oracles {

  private val decSumQty = "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)"

  /** langid oracle mirrors TextStats.langId exactly: marker-hit counts via
    * split, argmax with alphabetical-language tie-break, 'und' fallback. */
  private def langidSql: String = {
    val markers = graft.operators.TextStats.langMarkers.toSeq.sortBy(_._1)
    def hits(ms: Seq[String]): String =
      ms.map(m => s"(len(str_split(padded, '$m')) - 1)").mkString(" + ")
    val scoreCols = markers.map { case (lang, ms) => s"${hits(ms)} AS s_$lang" }
    val best = "GREATEST(" + markers.map { case (l, _) => s"s_$l" }.mkString(", ") + ")"
    val caseArm = markers.map { case (l, _) =>
      s"WHEN s_$l = best AND s_$l > 0 THEN '$l'"
    }.mkString(" ")
    s"""WITH scored AS (
       |  SELECT ${scoreCols.mkString(", ")}
       |  FROM (SELECT ' ' || lower(text) || ' ' AS padded FROM documents)
       |), labeled AS (
       |  SELECT CASE $caseArm ELSE 'und' END AS lang_pred
       |  FROM (SELECT *, $best AS best FROM scored)
       |)
       |SELECT lang_pred, COUNT(*) AS n FROM labeled GROUP BY 1 ORDER BY 1""".stripMargin
  }

  private def qualitySql: String = {
    val punct = """(length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')))"""
    val toks = """str_split_regex(text, '\s+')"""
    val ltoks = """str_split_regex(lower(text), '\s+')"""
    val stops = s"len(list_filter($ltoks, t -> list_contains(['the','a','of','and','or'], t)))"
    val sumlen = s"list_aggregate(list_transform($toks, t -> length(t)), 'sum')"
    val digitRuns = """(len(str_split_regex(text, '[0-9]+')) - 1)"""
    s"""WITH raw AS (
       |  SELECT doc_id,
       |    CAST(len($toks) AS BIGINT) AS n_tokens,
       |    CAST(len($toks) + $digitRuns + $punct AS BIGINT) AS n_subwords,
       |    CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST($punct AS DOUBLE) / length(text) END AS punct_raw,
       |    CASE WHEN len($ltoks) = 0 THEN 0.0 ELSE CAST($stops AS DOUBLE) / len($ltoks) END AS stop_raw,
       |    CASE WHEN len($toks) = 0 THEN 0.0 ELSE CAST($sumlen AS DOUBLE) / len($toks) END AS avglen_raw
       |  FROM documents
       |)
       |SELECT doc_id, n_tokens, n_subwords,
       |  ROUND(punct_raw, 6) AS punct_ratio,
       |  ROUND(stop_raw, 6) AS stopword_ratio,
       |  ROUND(avglen_raw, 6) AS avg_token_len,
       |  ROUND(LEAST(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) *
       |        (CASE WHEN n_tokens > 5000 THEN 0.5 ELSE 1.0 END) *
       |        (GREATEST(0.0, 1.0 - punct_raw * 4.0) * 0.5 +
       |         LEAST(stop_raw * 5.0, 1.0) * 0.5), 6) AS quality
       |FROM raw ORDER BY doc_id""".stripMargin
  }

  val sql: Map[String, String] = Map(
    "q01_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00' AND l_quantity < 5
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q02_group_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  $decSumQty AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         |  ROUND($decSumQty / COUNT(*), 6) AS avg_qty,
         |  COUNT(*) AS n
         |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q03_join_agg" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1, 2 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q04_broadcast_dims" ->
      """SELECT r_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q05_anti_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_without_orders FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q06_semi_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_with_orders FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q07_window_topk" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rank FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rank
        |  FROM lineitem) WHERE rank <= 3 ORDER BY l_returnflag, rank""".stripMargin,

    "q08_union_dedup" ->
      """SELECT COUNT(*) AS n_distinct_nations, CAST(SUM(nationkey) AS BIGINT) AS sum_keys
        |FROM (SELECT DISTINCT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier))""".stripMargin,

    "q09_self_join" ->
      """SELECT n_pairs, COUNT(*) AS n_orders FROM (
        |  SELECT a.l_orderkey, COUNT(*) AS n_pairs
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
        |  GROUP BY 1) GROUP BY 1 ORDER BY 1""".stripMargin,

    "q10_null_fill" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 1.0 ELSE 0.0 END AS DOUBLE) AS v_isna,
        |  ROUND(COALESCE(nullif(l_discount, 0.0),
        |    AVG(nullif(l_discount, 0.0)) OVER ()), 6) AS v_filled
        |FROM lineitem WHERE l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q11_string_funcs" ->
      """SELECT p_partkey, lower(p_name) AS lower_name, upper(p_brand) AS upper_brand,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  CAST(len(str_split(p_name, ' ')) AS BIGINT) AS n_words,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  substring(p_name, 1, 5) AS prefix5
        |FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""".stripMargin,

    "q12_time_buckets" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q13_json_extract" ->
      """SELECT k % 10 AS k_bucket, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k
        |FROM (SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q14_numeric_sims" ->
      """SELECT l_orderkey, l_linenumber,
        |  ROUND(EXP(-2 * ABS(l_quantity - l_discount * 100) /
        |    (l_quantity + l_discount * 100 + 1e-5)), 6) AS scaled_inv,
        |  ROUND(EXP(-ABS(l_quantity - l_discount * 100)), 6) AS unscaled_inv,
        |  ROUND(LEAST(l_quantity, l_discount * 100) /
        |    (GREATEST(l_quantity, l_discount * 100) + 1e-5), 6) AS minmax_ratio
        |FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q15_str_to_num" ->
      """SELECT COUNT(*) AS n,
        |  CAST(SUM(CAST(k_num AS DECIMAL(18,2))) AS DOUBLE) AS sum_k,
        |  MIN(k_num) AS min_k, MAX(k_num) AS max_k
        |FROM (SELECT CAST(regexp_replace(props, '[^0-9.]', '', 'g') AS DOUBLE) AS k_num
        |      FROM events)""".stripMargin,

    "q16_token_cap" ->
      """SELECT doc_id,
        |  CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(LEAST(len(str_split(text, ' ')), 100) AS BIGINT) AS n_capped,
        |  CAST(len(str_split(text, ' ')[1:100]) AS BIGINT) AS n_sliced
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q17_doc_frequency" ->
      """SELECT token, COUNT(*) AS df FROM (
        |  SELECT unnest(list_distinct(str_split(text, ' '))) AS token FROM documents)
        |WHERE token <> '' GROUP BY 1 ORDER BY df DESC, token""".stripMargin,

    "q18_distinct_stats" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q19_hash_split" ->
      """SELECT CAST(('0x' || substr(md5(text), 17, 16))::UBIGINT % 10 AS INT) AS bucket,
        |  COUNT(*) AS n
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q20_dedup_exact" ->
      """SELECT COUNT(*) AS n_groups, CAST(SUM(group_size - 1) AS BIGINT) AS n_dup_rows
        |FROM (SELECT MIN(doc_id) AS rep_id, COUNT(*) AS group_size
        |      FROM documents GROUP BY md5(text))""".stripMargin,

    "q21_ngram_jaccard" ->
      """WITH d AS (SELECT doc_id, lang, source,
        |    list_distinct(str_split(lower(text), ' ')) AS g FROM documents)
        |SELECT id1, id2, ROUND(jacc, 6) AS jaccard FROM (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2,
        |    CASE WHEN (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) = 0 THEN 1.0
        |         ELSE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
        |              (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) END AS jacc
        |  FROM d a JOIN d b ON a.lang = b.lang AND a.source = b.source
        |    AND a.doc_id < b.doc_id)
        |WHERE jacc >= 0.95 ORDER BY id1, id2""".stripMargin,

    // exact all-pairs token-Jaccard — equals the Spark side's LSH-candidates→
    // verify pipeline because verified LSH recall is total on this corpus
    "q22_minhash_dedup" ->
      """WITH d AS (SELECT doc_id, list_distinct(str_split(lower(text), ' ')) AS g FROM documents)
        |SELECT id1, id2, ROUND(jacc, 6) AS jaccard FROM (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2,
        |    CASE WHEN (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) = 0 THEN 1.0
        |         ELSE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
        |              (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) END AS jacc
        |  FROM d a JOIN d b ON a.doc_id < b.doc_id)
        |WHERE jacc >= 0.9 ORDER BY id1, id2""".stripMargin,

    // same 60-bit md5 token simhash as Dedup.simhash60, brute-force hamming —
    // the Spark banding is pigeonhole-exact for hamming <= 3, so sets match
    "q23_simhash_neardup" ->
      """WITH tok AS (
        |  SELECT doc_id, ('0x' || substr(md5(t.tok), 1, 15))::BIGINT AS h
        |  FROM documents, unnest(str_split(lower(text), ' ')) AS t(tok)
        |  WHERE t.tok <> ''
        |), bits AS (
        |  SELECT doc_id, b.b, SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM tok, unnest(range(60)) AS b(b) GROUP BY 1, 2
        |), fp AS (
        |  SELECT doc_id, bit_or(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS simhash
        |  FROM bits GROUP BY 1
        |)
        |SELECT a.doc_id AS id1, b.doc_id AS id2,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3 ORDER BY 1, 2""".stripMargin,

    "q24_ann_brute" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT query_id, rank, corpus_id, ROUND(cosine, 6) AS cosine FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |    list_cosine_similarity(q.v, c.v) AS cosine,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.vec_id) AS rank
        |  FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id <> q.vec_id)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q25_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.4
        |ORDER BY id1, id2""".stripMargin,

    // full SQL replay of the SRP-LSH ANN path: identical md5-derived
    // hyperplanes (Similarity.srpPlaneComponent), buckets, hamming-1
    // multiprobe over 3 tables, exact cosine re-rank — not an approximation
    // of the Spark result but the same algorithm in the other engine.
    // ASSUMPTION (fp-order): bucket bits compare sign(Σ vᵢ·hᵢ); Spark sums
    // sequentially while DuckDB's SUM may reorder, so a plane dot within
    // ~1e-13 of 0 could flip a bit cross-engine. The testdata embeddings are
    // iid uniform components (|dot| ~ 0.1-1 typical, P(|dot|<1e-12) ≈ 1e-12
    // per (row, bit) — ~4e-8 across the corpus); if this ever fires, the
    // fix is recall-vs-brute comparison, not bit replay (AnnSpec holds one).
    "q26_ann_lsh" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |planes AS (
        |  SELECT t.t, b.b, i.i,
        |    ('0x' || substr(md5((42 + 7919 * t.t) || ':' || b.b || ':' || i.i), 1, 15))::BIGINT
        |      / 576460752303423488.0 - 1.0 AS w
        |  FROM unnest(range(3)) t(t), unnest(range(8)) b(b), unnest(range(64)) i(i)
        |), dots AS (
        |  SELECT e.vec_id, p.t, p.b, SUM(e.v[p.i + 1] * p.w) AS s
        |  FROM e, planes p GROUP BY 1, 2, 3
        |), codes AS (
        |  SELECT vec_id, t, CAST(SUM(CASE WHEN s >= 0 THEN (1 << b) ELSE 0 END) AS INT) AS bucket
        |  FROM dots GROUP BY 1, 2
        |), qprobes AS (
        |  SELECT c.vec_id AS query_id, c.t, xor(c.bucket, pr.m) AS bucket
        |  FROM codes c, (SELECT unnest([0,1,2,4,8,16,32,64,128]) AS m) pr
        |  WHERE c.vec_id < 10
        |), cand AS (
        |  SELECT DISTINCT q.query_id, c.vec_id AS corpus_id
        |  FROM qprobes q JOIN codes c ON q.t = c.t AND q.bucket = c.bucket
        |  WHERE c.vec_id <> q.query_id
        |), scored AS (
        |  SELECT cand.query_id, cand.corpus_id,
        |    row_number() OVER (PARTITION BY cand.query_id
        |      ORDER BY list_cosine_similarity(eq.v, ec.v) DESC, cand.corpus_id) AS rank
        |  FROM cand JOIN e eq ON eq.vec_id = cand.query_id
        |            JOIN e ec ON ec.vec_id = cand.corpus_id
        |)
        |SELECT query_id, rank, corpus_id FROM scored WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "q27_langid" -> langidSql,

    "q28_quality" -> qualitySql,

    "q29_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(
        |    str_split_regex(lower(text), '\s+'))), ' ')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the stub featurizer is md5-derived (byte 0 of the digest / 256 — a
    // power-of-two divisor, so the float is exact); dim is the constant 16
    "q30_multimodal" ->
      """SELECT doc_id AS id, CAST(16 AS INT) AS dim,
        |  ROUND(('0x' || substr(md5(text), 1, 2))::INT / 256.0, 6) AS f0
        |FROM documents ORDER BY id""".stripMargin,

    "q31_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |s AS (
        |  SELECT user_id, CASE WHEN prev_ts IS NULL
        |    OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000 THEN 1 ELSE 0 END AS new_session
        |  FROM g),
        |u AS (SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions
        |      FROM s GROUP BY 1)
        |SELECT n_sessions, COUNT(*) AS n_users FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    "q32_topk" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q33_vector_norms" ->
      """SELECT vec_id,
        |  ROUND(list_aggregate(list_transform(embedding::DOUBLE[], x -> abs(x)), 'sum'), 6) AS l1_norm,
        |  ROUND(sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x), 'sum')), 6) AS l2_norm,
        |  ROUND(list_cosine_similarity(embedding::DOUBLE[],
        |    list_reverse(embedding::DOUBLE[])), 6) AS cos_rev
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q34_eval_counts" ->
      """SELECT
        |  CAST(SUM(CASE WHEN value > 50 AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |  CAST(SUM(CASE WHEN value > 50 AND event_type <> 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |  CAST(SUM(CASE WHEN value <= 50 AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |  CAST(SUM(CASE WHEN value <= 50 AND event_type <> 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |FROM events""".stripMargin,

    "q35_repetition" ->
      """WITH toks AS (SELECT doc_id, str_split(lower(text), ' ') AS t FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(range(len(t) - 1),
        |         i -> t[i+1] || ' ' || t[i+2])) AS g FROM toks WHERE len(t) >= 2),
        |bgc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        |bga AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
        |          CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_f FROM bgc GROUP BY 1),
        |tg AS (SELECT doc_id, unnest(list_transform(range(len(t) - 2),
        |         i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
        |       FROM toks WHERE len(t) >= 3),
        |tgc AS (SELECT doc_id, g, COUNT(*) AS c FROM tg GROUP BY 1, 2),
        |tga AS (SELECT doc_id,
        |          CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / SUM(c) AS dup_f
        |        FROM tgc GROUP BY 1)
        |SELECT b.doc_id, n_bigrams, ROUND(top_f, 6) AS top_bigram_frac,
        |  ROUND(dup_f, 6) AS dup_trigram_frac
        |FROM bga b JOIN tga USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q36_shingle_novelty" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(greatest(len(t) - 5, 0) + 1),
        |    i -> array_to_string(t[i+1:i+5], '')))) AS g
        |  FROM (SELECT doc_id, str_split(lower(text), ' ') AS t FROM documents)
        |), own AS (SELECT g, MIN(doc_id) AS owner FROM sh GROUP BY 1)
        |SELECT sh.doc_id, COUNT(*) AS n_shingles,
        |  ROUND(CAST(SUM(CASE WHEN own.owner = sh.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
        |        / COUNT(*), 6) AS novel_frac
        |FROM sh JOIN own USING (g) GROUP BY 1 ORDER BY 1""".stripMargin,

    // closed-form ground truth of the flagship ER pipeline: the fixture
    // plants entity clusters by pure docId arithmetic (Fixture.entityOf —
    // cycle of 23 docs over sizes 1,1,1,2,2,3,5,8), so the cluster-size
    // histogram the pipeline must recover on 2000 pages is computable
    // exactly in SQL. Any blocking/scoring/clustering mistake (a split or a
    // merge) changes this histogram — a real end-to-end oracle, not a count.
    "q40_er_clusters" ->
      """WITH doc AS (
        |  SELECT (d.i // 23) * 8 +
        |    CASE WHEN d.i % 23 < 1 THEN 0 WHEN d.i % 23 < 2 THEN 1
        |         WHEN d.i % 23 < 3 THEN 2 WHEN d.i % 23 < 5 THEN 3
        |         WHEN d.i % 23 < 7 THEN 4 WHEN d.i % 23 < 10 THEN 5
        |         WHEN d.i % 23 < 15 THEN 6 ELSE 7 END AS entity
        |  FROM unnest(range(2000)) AS d(i)
        |), sz AS (SELECT entity, COUNT(*) AS size FROM doc GROUP BY 1)
        |SELECT size, COUNT(*) AS n_clusters FROM sz GROUP BY 1 ORDER BY 1""".stripMargin,

    // two-table closed form: each entity of size s has ONE canonical page
    // (copy 0) and s−1 duplicate copies; a perfect cross-set linkage gives
    // that canonical page exactly s−1 matches (entities of size 1 produce
    // no output row). Same docId arithmetic as q40.
    "q41_two_table" ->
      """WITH doc AS (
        |  SELECT (d.i // 23) * 8 +
        |    CASE WHEN d.i % 23 < 1 THEN 0 WHEN d.i % 23 < 2 THEN 1
        |         WHEN d.i % 23 < 3 THEN 2 WHEN d.i % 23 < 5 THEN 3
        |         WHEN d.i % 23 < 7 THEN 4 WHEN d.i % 23 < 10 THEN 5
        |         WHEN d.i % 23 < 15 THEN 6 ELSE 7 END AS entity
        |  FROM unnest(range(2000)) AS d(i)
        |), sz AS (SELECT entity, COUNT(*) AS size FROM doc GROUP BY 1)
        |SELECT CAST(size - 1 AS BIGINT) AS n_matches, COUNT(*) AS n_left_pages
        |FROM sz WHERE size >= 2 GROUP BY 1 ORDER BY 1""".stripMargin,

    // the incremental (deltaPairsTwoTable) run must reproduce the one-shot
    // q41 matches exactly — same closed-form histogram as the q41 oracle
    "q42_two_table_incremental" ->
      """WITH doc AS (
        |  SELECT (d.i // 23) * 8 +
        |    CASE WHEN d.i % 23 < 1 THEN 0 WHEN d.i % 23 < 2 THEN 1
        |         WHEN d.i % 23 < 3 THEN 2 WHEN d.i % 23 < 5 THEN 3
        |         WHEN d.i % 23 < 7 THEN 4 WHEN d.i % 23 < 10 THEN 5
        |         WHEN d.i % 23 < 15 THEN 6 ELSE 7 END AS entity
        |  FROM unnest(range(2000)) AS d(i)
        |), sz AS (SELECT entity, COUNT(*) AS size FROM doc GROUP BY 1)
        |SELECT CAST(size - 1 AS BIGINT) AS n_matches, COUNT(*) AS n_left_pages
        |FROM sz WHERE size >= 2 GROUP BY 1 ORDER BY 1""".stripMargin,

    // full SQL replay of the q43 artifact: same token vocabulary (distinct
    // lower-split tokens, ids = row_number over binary token order — Spark's
    // UTF8 ordering ≡ DuckDB's default binary collation), same md5-derived
    // dyadic vector components (x/256 with |x| ≤ 128: exact in float32, so
    // the Parquet round trip the Spark side performs is bit-lossless), same
    // 1/sqrt(df) IDF weights (IEEE double sqrt both engines)
    "q43_embedding_artifact" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, t.tok AS token
        |  FROM documents, unnest(str_split(lower(text), ' ')) AS t(tok)
        |  WHERE t.tok <> ''
        |), vocab AS (
        |  SELECT token, CAST(row_number() OVER (ORDER BY token) AS BIGINT) AS id
        |  FROM (SELECT DISTINCT token FROM tok)
        |), dfreq AS (
        |  SELECT token, COUNT(*) AS df FROM tok GROUP BY 1
        |)
        |SELECT v.token, v.id,
        |  ROUND(CAST(('0x' || substr(md5(v.token || ':0'), 1, 4))::INT % 256 - 128
        |    AS DOUBLE) / 256.0, 6) AS v0,
        |  ROUND(1.0 / sqrt(dfreq.df), 6) AS idf_w
        |FROM vocab v JOIN dfreq USING (token) ORDER BY v.id""".stripMargin,

    // closed-form media coverage per corpus variant: media is stripped for
    // entity%3 == 0 ("strip_e0") or kept only there ("keep_e0"); coverage =
    // media_rows/rows exactly (both the manifest-counter path and the
    // per-partition sample are exact at this size), and the bias is the
    // calibrated default (-11) above the 0.5 threshold, the fitted
    // media-less handback (-11 + 1.6) below it (Scoring.Weights)
    "q44_media_profile" ->
      """WITH doc AS (
        |  SELECT (d.i // 23) * 8 +
        |    CASE WHEN d.i % 23 < 1 THEN 0 WHEN d.i % 23 < 2 THEN 1
        |         WHEN d.i % 23 < 3 THEN 2 WHEN d.i % 23 < 5 THEN 3
        |         WHEN d.i % 23 < 7 THEN 4 WHEN d.i % 23 < 10 THEN 5
        |         WHEN d.i % 23 < 15 THEN 6 ELSE 7 END AS entity
        |  FROM unnest(range(1500)) AS d(i)
        |), agg AS (
        |  SELECT 'keep_e0' AS case_id,
        |    CAST(SUM(CASE WHEN entity % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS media_rows,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows
        |  FROM doc
        |  UNION ALL
        |  SELECT 'strip_e0',
        |    CAST(SUM(CASE WHEN entity % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(COUNT(*) AS BIGINT)
        |  FROM doc
        |)
        |SELECT case_id, media_rows, n_rows,
        |  ROUND(CAST(media_rows AS DOUBLE) / n_rows, 6) AS coverage,
        |  ROUND(CAST(media_rows AS DOUBLE) / n_rows, 6) AS coverage_sampled,
        |  CAST(CASE WHEN CAST(media_rows AS DOUBLE) / n_rows >= 0.5
        |       THEN ROUND(-11.0, 6) ELSE ROUND(-11.0 + 1.6, 6) END AS DOUBLE) AS bias
        |FROM agg ORDER BY case_id""".stripMargin
  )
}
