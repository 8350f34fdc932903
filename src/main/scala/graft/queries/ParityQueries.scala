package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Scalars

/** Reference-parity operator queries (SURVEY.md §2 inventory), each pairing a Spark
  * DataFrame program with an independent DuckDB ground-truth SQL for the driver's
  * oracle (`SparkEntry.queries` / `SparkEntry.oracleSql`).
  *
  * Cross-engine determinism rules used throughout:
  *   - money sums go through integer cents (`round(x*100)::bigint`) so the sum is
  *     exact in int64 in both engines — float sum order never matters;
  *   - recomputed doubles are rounded to ≥6 decimal digits of slack vs the ~1e-10
  *     accumulation error; raw doubles pass through untouched (bit-identical);
  *   - timestamps are emitted as formatted strings (the reference's own convention,
  *     /root/reference/app.py:236 — and it dodges ns-vs-us physical encodings);
  *   - every window/sort has a unique trailing tie-breaker key;
  *   - DuckDB `sum(BIGINT)` returns HUGEINT, so oracle sums are cast back to BIGINT.
  */
object ParityQueries {

  // r17: reader plans memoized per (session, dir, table) — a DataFrame is an
  // immutable plan, not data; this avoids re-reading the parquet footer and
  // re-running schema inference on every one of the suite's reader call
  // sites, every construction, every rep. Every action still computes from
  // the parquet inputs.
  // r18 (VERDICT #7 stance): the key includes the on-disk state signature so
  // an in-session regeneration of a table at the same path misses the memo
  // instead of serving a stale file listing.
  private val readerCache =
    scala.collection.concurrent.TrieMap[(SparkSession, String, String, String), DataFrame]()

  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    readerCache.getOrElseUpdate(
      (s, dir, name, graft.queries.ExtensionQueries.fsSignature(path)),
      s.read.parquet(path))
  }

  /** events.parquet stores TIMESTAMP(NANOS); under
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set by Verify/Bench) `ts` arrives
    * as long nanos — convert to TimestampType (µs). `ts div 1000` keeps the math in
    * int64 (a double round-trip would lose sub-µs bits at epoch-nano magnitudes).
    */
  private[graft] def events(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // parquet written with isAdjustedToUTC=false reads as TIMESTAMP_NTZ
        // under Spark 4's NTZ inference; the session runs in UTC, so the
        // cast is value-preserving and restores the TIMESTAMP type the
        // operator layer (unix_micros etc.) expects.
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Exact money arithmetic: dollars×100 as int64 (bit-stable across engines). */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** dollars×10000 as int64, for 2dp×2dp products like price*(1-discount). */
  private def x10k(c: Column): Column = round(c * 10000).cast("long")

  // ---------------------------------------------------------------------------
  // Q1 — pricing summary: the reference's cost rollup shape (A4) over lineitem:
  // global-ish groupBy + sums/counts/avg, filter pushed to the parquet scan.
  // ---------------------------------------------------------------------------
  private def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_base_price_cents"),
        sum(x10k(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price_x10k"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_price_x10k,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       GROUP BY l_returnflag, l_linestatus"""

  // ---------------------------------------------------------------------------
  // Q2 — selective filter + narrow projection (P1/P2): predicate and column set
  // must both reach the parquet scan (PushedFilters / ReadSchema).
  // ---------------------------------------------------------------------------
  private def q2Filter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24 &&
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
        col("l_quantity"), col("l_returnflag"))

  private val q2Sql =
    """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_returnflag
       FROM lineitem
       WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
         AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'"""

  // ---------------------------------------------------------------------------
  // Q3 — star join with broadcast dims (J1 shape at scale: fact shuffles once on
  // the join key, small dims broadcast — no shuffle for nation/region).
  // ---------------------------------------------------------------------------
  private def q3Join(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    val nat = t(s, dir, "nation")
    val reg = t(s, dir, "region")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust.select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(x10k(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_x10k"),
        count(lit(1)).as("n_lines"))
  }

  private val q3Sql =
    """SELECT r_name, n_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_x10k,
       count(*) AS n_lines
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name, n_name"""

  // ---------------------------------------------------------------------------
  // Q4 — anti join: the registry "insert-if-absent" probe (J1,
  // /root/reference/app.py:191-203) re-expressed as customers with no orders.
  // ---------------------------------------------------------------------------
  private def q4Anti(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val bigOrd = t(s, dir, "orders")
      .filter(col("o_totalprice") > 300000).select(col("o_custkey"))
    cust.join(bigOrd, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers_no_big_orders"),
        sum(cents(col("c_acctbal"))).as("acctbal_cents"))
  }

  private val q4Sql =
    """SELECT c_mktsegment, count(*) AS n_customers_no_big_orders,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
       FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
       GROUP BY c_mktsegment"""

  // ---------------------------------------------------------------------------
  // Q5 — global top-k (O4/A7 "latest zip" generalized): rank column makes the
  // order verifiable under the driver's order-insensitive hash.
  // ---------------------------------------------------------------------------
  private def q5TopK(s: SparkSession, dir: String): DataFrame = {
    // orderBy + limit compiles to TakeOrderedAndProject: per-partition top-k
    // merged on the driver — no shuffle of the full table, unlike a global
    // row_number window (which WindowExec collapses to ONE partition). The
    // rank window below runs over the ≤10-row result, so its single partition
    // is bounded by k, not by the data (partitionBy(lit) documents that).
    val ord = Seq(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
      .orderBy(ord: _*)
      .limit(10)
      .withColumn("rank", row_number().over(Window.partitionBy(lit(0)).orderBy(ord: _*)))
  }

  private val q5Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus,
       CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rank
       FROM orders QUALIFY rank <= 10"""

  // ---------------------------------------------------------------------------
  // Q6 — latest-per-group window (A7: max(results_*.zip) per job ⇒ latest order
  // per customer), emitted with the reference timestamp format (F6).
  // ---------------------------------------------------------------------------
  private def q6Latest(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("latest_orderkey"),
        Scalars.formatTs(col("o_orderdate")).as("latest_orderdate"))
  }

  private val q6Sql =
    """SELECT o_custkey, o_orderkey AS latest_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS latest_orderdate
       FROM orders
       QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1"""

  // ---------------------------------------------------------------------------
  // Q7 — input catalog projection (S5 + F1/F2/F3): normalize a messy windows-ish
  // path, classify extension (incl. the "unknown" default), split name/stem.
  // The oracle derives ground truth by construction, so the Spark regexes are
  // independently checked.
  // ---------------------------------------------------------------------------
  private def q7Catalog(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val extRaw = element_at(
      array(lit(".txt"), lit(".MD"), lit(".Tif"), lit("")),
      (col("doc_id") % 4).cast("int") + 1)
    val messy = concat(lit(".\\"), col("source"), lit("\\"), lit("doc_"),
      col("doc_id").cast("string"), extRaw)
    docs.select(
      col("doc_id"),
      Scalars.normalizeRelPath(messy).as("rel_path"),
      Scalars.baseName(Scalars.normalizeRelPath(messy)).as("file_name"),
      Scalars.stemName(Scalars.normalizeRelPath(messy)).as("file_stem"),
      Scalars.fileExtension(messy).as("file_type"),
      col("n_chars").as("file_size"))
  }

  private val q7Sql =
    """SELECT doc_id,
       source || '/doc_' || CAST(doc_id AS VARCHAR) ||
         CASE doc_id % 4 WHEN 0 THEN '.txt' WHEN 1 THEN '.MD' WHEN 2 THEN '.Tif' ELSE '' END AS rel_path,
       'doc_' || CAST(doc_id AS VARCHAR) ||
         CASE doc_id % 4 WHEN 0 THEN '.txt' WHEN 1 THEN '.MD' WHEN 2 THEN '.Tif' ELSE '' END AS file_name,
       'doc_' || CAST(doc_id AS VARCHAR) AS file_stem,
       CASE doc_id % 4 WHEN 0 THEN '.txt' WHEN 1 THEN '.md' WHEN 2 THEN '.tif' ELSE 'unknown' END AS file_type,
       n_chars AS file_size
       FROM documents"""

  // ---------------------------------------------------------------------------
  // Q8 — grouping with ordered list-agg: the engine's core repartition op (A1,
  // _build_groups /root/reference/worker.py:23-50). Ordered ids emitted as a
  // joined string (arrays dodge the driver's value hasher).
  // ---------------------------------------------------------------------------
  private def q8Groups(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("source").as("group_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        array_join(sort_array(collect_list(col("doc_id"))), ",").as("doc_ids"))

  private val q8Sql =
    """SELECT source AS group_id, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids
       FROM documents GROUP BY source"""

  // ---------------------------------------------------------------------------
  // Q9 — status derivation (A8, /root/reference/app.py:990-1001): when/otherwise
  // chain + rollup by derived label.
  // ---------------------------------------------------------------------------
  private def q9Status(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("status_label",
        when(col("o_orderstatus") === "F", "Finished")
          .when(col("o_orderstatus") === "O", "Running")
          .when(col("o_orderstatus") === "P", "Pending")
          .otherwise("Unknown"))
      .groupBy("status_label", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("totalprice_cents"))

  private val q9Sql =
    """SELECT CASE o_orderstatus WHEN 'F' THEN 'Finished' WHEN 'O' THEN 'Running'
                 WHEN 'P' THEN 'Pending' ELSE 'Unknown' END AS status_label,
       o_orderpriority, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS totalprice_cents
       FROM orders GROUP BY 1, 2"""

  // ---------------------------------------------------------------------------
  // Q10 — timestamp bucketing (F6): format-then-group, the jobs-archive's
  // submitted_at handling shape.
  // ---------------------------------------------------------------------------
  private def q10TsBuckets(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 4).as("sum_value"))

  private val q10Sql =
    """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       count(*) AS n_events, round(sum("value"), 4) AS sum_value
       FROM events GROUP BY 1, 2"""

  // ---------------------------------------------------------------------------
  // Q11 — JSON field extraction (F12-adjacent; events.props is well-formed JSON,
  // the lenient-repair path is exercised by Q18 and unit tests).
  // ---------------------------------------------------------------------------
  private def q11Json(s: SparkSession, dir: String): DataFrame =
    // r18 (guide §2, parallelism floor): per-row JSON extraction is this
    // query's cost and it sat at the scan's split count (one task on the
    // single-row-group bench file). Fanout is conditional — a no-op at real
    // scale — and every aggregate here is exact (long sum/count/min/max),
    // so values are partitioning-independent.
    graft.ops.Fanout.forCpu(events(s, dir))
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"),
        count(col("k")).as("n_with_k"),
        min("k").as("min_k"), max("k").as("max_k"))

  private val q11Sql =
    """SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, 'k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(CAST(json_extract_string(props, 'k') AS BIGINT)) AS n_with_k,
       min(CAST(json_extract_string(props, 'k') AS BIGINT)) AS min_k,
       max(CAST(json_extract_string(props, 'k') AS BIGINT)) AS max_k
       FROM events GROUP BY event_type"""

  // ---------------------------------------------------------------------------
  // Q12 — content hashing (A2/A3): per-doc sha256, then the scalable hierarchical
  // combine — sha256 over the sorted per-item hashes (SURVEY §7.4.1's 100 TB
  // formulation of /root/reference/app.py:107-137).
  // ---------------------------------------------------------------------------
  private def q12Hash(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("doc_sha", sha2(col("text"), 256))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sha2(array_join(sort_array(collect_list(col("doc_sha"))), ""), 256).as("content_sha256"))

  private val q12Sql =
    """SELECT source, count(*) AS n_docs,
       sha256(string_agg(sha256(text), '' ORDER BY sha256(text))) AS content_sha256
       FROM documents GROUP BY source"""

  // ---------------------------------------------------------------------------
  // Q13 — sequence renumber (K4/F5, /root/reference/worker.py:220-236): global
  // row_number → zfill(9) → literal token replacement.
  // ---------------------------------------------------------------------------
  private def q13Renumber(s: SparkSession, dir: String): DataFrame =
    // global numbering via the two-phase SeqNumber op — a raw
    // Window.orderBy(doc_id) would collapse to a single partition.
    // r18 (guide §2.3): projected to the two columns the query emits before
    // the numbering — the zipWithIndex boundary is opaque to Catalyst, so an
    // un-projected input shipped the full text column through the range
    // exchange and row conversion. Same rows, same order, same rn.
    graft.ops.SeqNumber.withGlobalSeq(
      t(s, dir, "documents").select(col("doc_id"), col("source")),
      "rn", col("doc_id"))
      .select(col("doc_id"),
        Scalars.renumberToken(
          concat(lit("entry 000000001 of "), col("source"), lit(" [000000001]")),
          col("rn")).as("line"))

  private val q13Sql =
    """SELECT doc_id,
       replace('entry 000000001 of ' || source || ' [000000001]', '000000001',
               lpad(CAST(row_number() OVER (ORDER BY doc_id) AS VARCHAR), 9, '0')) AS line
       FROM documents"""

  // ---------------------------------------------------------------------------
  // Q14 — humanized file size (F8, /root/reference/app.py:73-82) over synthetic
  // byte counts spanning B → GB.
  // ---------------------------------------------------------------------------
  private def q14Sizes(s: SparkSession, dir: String): DataFrame = {
    val bytes = col("n_chars") * (col("doc_id") * col("doc_id") + lit(1))
    t(s, dir, "documents")
      .select(col("doc_id"), bytes.as("n_bytes"),
        Scalars.formatFileSize(bytes).as("size_label"))
  }

  // Both engines pre-round HALF_UP to 2 dp, then pad with printf %.2f — exact-tie
  // values (k/8 fractions of /1024) would otherwise split on formatter tie modes.
  private val q14Sql =
    """SELECT doc_id, CAST(n_chars * (doc_id * doc_id + 1) AS BIGINT) AS n_bytes,
       CASE
         WHEN b < 1024 THEN CAST(CAST(b AS BIGINT) AS VARCHAR) || ' B'
         WHEN b < 1048576 THEN printf('%.2f', round(b / 1024, 2)) || ' KB'
         WHEN b < 1073741824 THEN printf('%.2f', round(b / 1048576, 2)) || ' MB'
         WHEN b < 1099511627776 THEN printf('%.2f', round(b / 1073741824, 2)) || ' GB'
         ELSE printf('%.2f', round(b / 1099511627776, 2)) || ' TB'
       END AS size_label
       FROM (SELECT doc_id, n_chars, CAST(n_chars * (doc_id * doc_id + 1) AS DOUBLE) AS b FROM documents)"""

  // ---------------------------------------------------------------------------
  // Q15 — exact dedup accounting (J1 generalized; extension x1's oracle): distinct
  // keys per group after a deliberate key-coarsening (prefix) to manufacture dups.
  // ---------------------------------------------------------------------------
  private def q15Dedup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("key", sha2(substring(col("text"), 1, 40), 256))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("key")).as("n_unique"),
        (count(lit(1)) - countDistinct(col("key"))).as("n_dups"))

  private val q15Sql =
    """SELECT lang, count(*) AS n_docs,
       count(DISTINCT sha256(substr(text, 1, 40))) AS n_unique,
       count(*) - count(DISTINCT sha256(substr(text, 1, 40))) AS n_dups
       FROM documents GROUP BY lang"""

  // ---------------------------------------------------------------------------
  // Q16 — elapsed format/parse round-trip (F7, /root/reference/app.py:1038-1057 +
  // worker.py:410-411): seconds → "N days, H:MM:SS" → seconds.
  // ---------------------------------------------------------------------------
  private def q16Elapsed(s: SparkSession, dir: String): DataFrame = {
    val secs = (col("event_id") * 97L) % 200000L
    // r18 (guide §2, parallelism floor): q16 is a pure per-row
    // format/parse projection — the q-suite's most serial query (r17
    // scaling 0.96) because the whole roundtrip ran on the scan's single
    // split. Per-row values are partitioning-independent by construction.
    graft.ops.Fanout.forCpu(events(s, dir))
      .select(col("event_id"), secs.as("secs"),
        Scalars.formatElapsed(secs).as("elapsed"))
      .withColumn("parsed_secs", Scalars.parseElapsedSeconds(col("elapsed")).cast("long"))
  }

  private val q16Sql =
    """SELECT event_id, secs,
       CASE WHEN d > 0 THEN CAST(d AS VARCHAR) || (CASE WHEN d = 1 THEN ' day, ' ELSE ' days, ' END) ELSE '' END
         || CAST(h AS VARCHAR) || ':' || lpad(CAST(m AS VARCHAR), 2, '0') || ':' || lpad(CAST(sec AS VARCHAR), 2, '0') AS elapsed,
       secs AS parsed_secs
       FROM (SELECT event_id, (event_id * 97) % 200000 AS secs,
                    (event_id * 97) % 200000 // 86400 AS d,
                    ((event_id * 97) % 200000 % 86400) // 3600 AS h,
                    ((event_id * 97) % 200000 % 3600) // 60 AS m,
                    (event_id * 97) % 200000 % 60 AS sec
             FROM events)"""

  // ---------------------------------------------------------------------------
  // Q17 — footer append branches (F4, /root/reference/worker.py:238-244): empty
  // base, trailing-newline base, plain base × blank/non-blank footer.
  // ---------------------------------------------------------------------------
  private def q17Footer(s: SparkSession, dir: String): DataFrame = {
    val base = when(col("doc_id") % 3 === 0, lit(""))
      .when(col("doc_id") % 3 === 1, concat(substring(col("text"), 1, 20), lit("\n")))
      .otherwise(substring(col("text"), 1, 20))
    val footer = when(col("doc_id") % 5 === 0, lit("   ")).otherwise(lit("-- processed by graft"))
    t(s, dir, "documents")
      .select(col("doc_id"), Scalars.appendFooter(base, footer).as("final_output"))
  }

  private val q17Sql =
    """SELECT doc_id,
       CASE WHEN doc_id % 5 = 0 THEN base
            WHEN base = '' OR base LIKE '%' || chr(10) OR base LIKE '%' || chr(13) THEN base || '-- processed by graft'
            ELSE base || chr(10) || '-- processed by graft' END AS final_output
       FROM (SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN ''
                    WHEN doc_id % 3 = 1 THEN substr(text, 1, 20) || chr(10)
                    ELSE substr(text, 1, 20) END AS base
             FROM documents)"""

  // ---------------------------------------------------------------------------
  // Q18 — lenient JSON repair (F12, /root/reference/worker.py:186-207): fenced
  // JSON, trailing commas, garbage → parse_ok=false; candidates normalized.
  // ---------------------------------------------------------------------------
  private def q18LenientJson(s: SparkSession, dir: String): DataFrame = {
    val raw = when(col("event_id") % 4 === 0,
        concat(lit("Here is the JSON:\n{\"id\": "), col("event_id").cast("string"), lit(", \"tags\": [1, 2,]}\nDone.")))
      .when(col("event_id") % 4 === 1, col("props"))
      .when(col("event_id") % 4 === 2, lit("no json here at all"))
      .otherwise(concat(lit("{\"broken\": "), col("event_id").cast("string")))
    val candidate = Scalars.lenientJsonCandidate(raw)
    // r18: same parallelism-floor rationale as q16 — per-row regex/JSON
    // repair, no aggregation, partitioning-independent values.
    graft.ops.Fanout.forCpu(events(s, dir))
      .select(col("event_id"), candidate.as("candidate"),
        Scalars.jsonParseOk(candidate).as("parse_ok"))
  }

  private val q18Sql =
    """SELECT event_id,
       CASE WHEN sliced = '' THEN NULL ELSE regexp_replace(sliced, ',(\s*[}\]])', '\1', 'g') END AS candidate,
       CASE WHEN sliced = '' THEN FALSE
            ELSE json_valid(regexp_replace(sliced, ',(\s*[}\]])', '\1', 'g')) END AS parse_ok
       FROM (SELECT event_id, regexp_extract(
               CASE WHEN event_id % 4 = 0 THEN 'Here is the JSON:' || chr(10) || '{"id": ' || CAST(event_id AS VARCHAR) || ', "tags": [1, 2,]}' || chr(10) || 'Done.'
                    WHEN event_id % 4 = 1 THEN props
                    WHEN event_id % 4 = 2 THEN 'no json here at all'
                    ELSE '{"broken": ' || CAST(event_id AS VARCHAR) END,
               '(?s)([\[{].*[\]}])', 1) AS sliced
             FROM events)"""

  // ---------------------------------------------------------------------------
  // Q19 — cost-summary rollup (A4, /root/reference/worker.py:110-176): one global
  // aggregate row over synthesized per-request usage; success/failure counted
  // from the data, retry-safe (SURVEY §7.4.5).
  // ---------------------------------------------------------------------------
  private def q19CostRollup(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val promptToks = col("event_id") % 1000L
    val completionToks = col("event_id") % 400L
    ev.agg(
      count(lit(1)).as("api_requests"),
      count(when(col("event_type") =!= "error", 1)).as("successful_requests"),
      count(when(col("event_type") === "error", 1)).as("failed_requests"),
      count(when(col("event_id") % 7 === 0, 1)).as("byok_requests"),
      sum(promptToks).as("prompt_tokens"),
      sum(completionToks).as("completion_tokens"),
      sum(promptToks + completionToks).as("total_tokens"),
      round(sum(col("value") / 1000), 6).as("total_cost"))
  }

  private val q19Sql =
    """SELECT count(*) AS api_requests,
       count(CASE WHEN event_type <> 'error' THEN 1 END) AS successful_requests,
       count(CASE WHEN event_type = 'error' THEN 1 END) AS failed_requests,
       count(CASE WHEN event_id % 7 = 0 THEN 1 END) AS byok_requests,
       CAST(sum(event_id % 1000) AS BIGINT) AS prompt_tokens,
       CAST(sum(event_id % 400) AS BIGINT) AS completion_tokens,
       CAST(sum(event_id % 1000 + event_id % 400) AS BIGINT) AS total_tokens,
       round(sum("value" / 1000), 6) AS total_cost
       FROM events"""

  // ---------------------------------------------------------------------------
  // Q20 — jobs-archive multi-key sort with nulls-last (O3,
  // /root/reference/app.py:1038-1081): rank column encodes the order; Spark's
  // default asc is NULLS FIRST so the nulls-last intent is explicit.
  // ---------------------------------------------------------------------------
  private def q20ArchiveSort(s: SparkSession, dir: String): DataFrame = {
    val priOrNull = when(col("o_orderkey") % 10 === 0, lit(null).cast("string"))
      .otherwise(col("o_orderpriority"))
    // r18 (VERDICT #4, guide §2.3): project to the two output columns BEFORE
    // the global numbering — SeqNumber's rdd.zipWithIndex boundary is opaque
    // to Catalyst, so an un-projected input shipped all 9 orders columns
    // (o_comment included) through the range exchange, the sampling pass and
    // the row conversion. Same rows, same sort keys, same ranks.
    graft.ops.SeqNumber.withGlobalSeq(
      t(s, dir, "orders").select(col("o_orderkey"), priOrNull.as("sort_key")),
      "rank", col("sort_key").asc_nulls_last, col("o_orderkey").asc)
      .select(col("o_orderkey"), col("sort_key"), col("rank").cast("int").as("rank"))
  }

  private val q20Sql =
    """SELECT o_orderkey, sort_key,
       CAST(row_number() OVER (ORDER BY sort_key ASC NULLS LAST, o_orderkey ASC) AS INT) AS rank
       FROM (SELECT o_orderkey,
               CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_orderpriority END AS sort_key
             FROM orders)"""

  // ---------------------------------------------------------------------------
  // Q23 — set operations (§2.7 pass-through capabilities): customers ordering
  // in 1995 vs 1996 → UNION / INTERSECT / EXCEPT with a tag column.
  // ---------------------------------------------------------------------------
  private def q23SetOps(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    def keysIn(year: Int) = ord
      .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .select(col("o_custkey")).distinct()
    val a = keysIn(1995)
    val b = keysIn(1996)
    a.union(b).distinct().withColumn("op", lit("union"))
      .unionByName(a.intersect(b).withColumn("op", lit("intersect")))
      .unionByName(a.except(b).withColumn("op", lit("except")))
  }

  private val q23Sql =
    """WITH a AS (SELECT DISTINCT o_custkey FROM orders
                  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'),
            b AS (SELECT DISTINCT o_custkey FROM orders
                  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
       SELECT o_custkey, 'union' AS op FROM (SELECT o_custkey FROM a UNION SELECT o_custkey FROM b)
       UNION ALL
       SELECT o_custkey, 'intersect' AS op FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
       UNION ALL
       SELECT o_custkey, 'except' AS op FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)"""

  // ---------------------------------------------------------------------------
  // Q24 — event-time tumbling windows (§2.9 / streaming EventTimeOps, run in
  // batch: window() is the same expression in both modes). Spark's tumbling
  // windows align to the epoch; the oracle re-derives the bucket with integer
  // epoch-nanosecond division, so the window math is independently checked.
  // Window bounds go out as formatted strings (F6) to dodge ns-vs-µs physics.
  // ---------------------------------------------------------------------------
  private def q24EventWindows(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
      .select(Scalars.formatTs(col("window.start")).as("window_start"),
        Scalars.formatTs(col("window.end")).as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  private val q24Sql =
    """WITH t AS (SELECT event_type, "value", epoch_ns(ts) // 300000000000 AS bucket FROM events)
       SELECT strftime(make_timestamp(bucket * 300000000), '%Y-%m-%d %H:%M:%S') AS window_start,
              strftime(make_timestamp((bucket + 1) * 300000000), '%Y-%m-%d %H:%M:%S') AS window_end,
              event_type, count(*) AS n_events, round(sum("value"), 4) AS sum_value
       FROM t GROUP BY 1, 2, 3"""

  // ---------------------------------------------------------------------------
  // Q25 — pivot: event_type × day-of-week matrix (groupBy().pivot() with an
  // explicit value list → deterministic columns; oracle = conditional aggs).
  // ---------------------------------------------------------------------------
  private def q25Pivot(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("dow", date_format(col("ts"), "E"))
      .groupBy(col("event_type"))
      .pivot("dow", Seq("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"))
      .agg(count(lit(1)))
      .na.fill(0L)

  private val q25Sql =
    """SELECT event_type,
       count(CASE WHEN dayname(ts) = 'Monday' THEN 1 END) AS "Mon",
       count(CASE WHEN dayname(ts) = 'Tuesday' THEN 1 END) AS "Tue",
       count(CASE WHEN dayname(ts) = 'Wednesday' THEN 1 END) AS "Wed",
       count(CASE WHEN dayname(ts) = 'Thursday' THEN 1 END) AS "Thu",
       count(CASE WHEN dayname(ts) = 'Friday' THEN 1 END) AS "Fri",
       count(CASE WHEN dayname(ts) = 'Saturday' THEN 1 END) AS "Sat",
       count(CASE WHEN dayname(ts) = 'Sunday' THEN 1 END) AS "Sun"
       FROM events GROUP BY event_type"""

  // ---------------------------------------------------------------------------
  // Q26 — rollup: multi-level aggregation (orderstatus → priority hierarchy)
  // with grouping-level indicators; NULL group keys replaced by a sentinel so
  // the driver's order-insensitive hash treats subtotal rows consistently.
  // ---------------------------------------------------------------------------
  private def q26Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("totalprice_cents"),
        grouping_id().as("gid"))
      .select(coalesce(col("o_orderstatus"), lit("(all)")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("o_orderpriority"),
        col("n_orders"), col("totalprice_cents"), col("gid").cast("long").as("gid"))

  private val q26Sql =
    """SELECT coalesce(o_orderstatus, '(all)') AS o_orderstatus,
              coalesce(o_orderpriority, '(all)') AS o_orderpriority,
              count(*) AS n_orders,
              CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS totalprice_cents,
              CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid
       FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_pivot" -> q25Pivot _,
    "q26_rollup" -> q26Rollup _,
    "q24_event_windows" -> q24EventWindows _,
    "q23_set_ops" -> q23SetOps _,
    "q01_pricing_summary" -> q1Agg _,
    "q02_filter_project" -> q2Filter _,
    "q03_join_revenue_by_nation" -> q3Join _,
    "q04_anti_join_no_orders" -> q4Anti _,
    "q05_topk_orders" -> q5TopK _,
    "q06_latest_order_per_customer" -> q6Latest _,
    "q07_input_catalog" -> q7Catalog _,
    "q08_group_by_source" -> q8Groups _,
    "q09_status_derivation" -> q9Status _,
    "q10_ts_buckets" -> q10TsBuckets _,
    "q11_json_extract" -> q11Json _,
    "q12_content_hash" -> q12Hash _,
    "q13_seq_renumber" -> q13Renumber _,
    "q14_size_humanize" -> q14Sizes _,
    "q15_dedup_exact_stats" -> q15Dedup _,
    "q16_elapsed_roundtrip" -> q16Elapsed _,
    "q17_footer_append" -> q17Footer _,
    "q18_lenient_json" -> q18LenientJson _,
    "q19_cost_rollup" -> q19CostRollup _,
    "q20_archive_sort" -> q20ArchiveSort _
  )

  val oracleSql: Map[String, String] = Map(
    "q25_pivot" -> q25Sql,
    "q26_rollup" -> q26Sql,
    "q24_event_windows" -> q24Sql,
    "q23_set_ops" -> q23Sql,
    "q01_pricing_summary" -> q1Sql,
    "q02_filter_project" -> q2Sql,
    "q03_join_revenue_by_nation" -> q3Sql,
    "q04_anti_join_no_orders" -> q4Sql,
    "q05_topk_orders" -> q5Sql,
    "q06_latest_order_per_customer" -> q6Sql,
    "q07_input_catalog" -> q7Sql,
    "q08_group_by_source" -> q8Sql,
    "q09_status_derivation" -> q9Sql,
    "q10_ts_buckets" -> q10Sql,
    "q11_json_extract" -> q11Sql,
    "q12_content_hash" -> q12Sql,
    "q13_seq_renumber" -> q13Sql,
    "q14_size_humanize" -> q14Sql,
    "q15_dedup_exact_stats" -> q15Sql,
    "q16_elapsed_roundtrip" -> q16Sql,
    "q17_footer_append" -> q17Sql,
    "q18_lenient_json" -> q18Sql,
    "q19_cost_rollup" -> q19Sql,
    "q20_archive_sort" -> q20Sql
  )
}
