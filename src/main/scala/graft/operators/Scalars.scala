package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.H scalar function surface (SURVEY.md) — string/date/math/conditional/
  * json/array/map/hash/cast/explode. Everything stays on
  * `org.apache.spark.sql.functions._` built-ins so the expressions remain
  * inside whole-stage codegen; no UDFs. Oracle-side dialect traps handled
  * per SURVEY.md §7.3.4 (regex common subset, epoch truncation, string
  * extraction for JSON).
  */
object Scalars {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val qs: Seq[Q] = Seq(

    // Binary/codec scalar panel (round 13): base64, hex, MD5 and
    // SHA-256 over a bounded text prefix — the encode/fingerprint
    // primitives ETL uses for keys, cache tags and payload transport.
    // The 24-char prefix keeps Spark's base64 inside one RFC-2045
    // chunk (its encoder line-breaks past 76 output chars; DuckDB's
    // never does), and hex is case-normalized (Spark upper, DuckDB
    // upper for letters — lower() on both sides pins it).
    Q("fn_codec",
      """SELECT doc_id,
        |       base64(encode(substr(text, 1, 24))) AS b64,
        |       lower(hex(substr(text, 1, 24))) AS hx,
        |       md5(substr(text, 1, 24)) AS md5_hex,
        |       sha256(substr(text, 1, 24)) AS sha256_hex,
        |       CAST(length(substr(text, 1, 24)) AS BIGINT) AS n_chars
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        graft.Tables(s, d, "documents")
          .where(col("doc_id") < 200)
          .select(col("doc_id"),
            base64(substring(col("text"), 1, 24).cast("binary")).as("b64"),
            lower(hex(substring(col("text"), 1, 24))).as("hx"),
            md5(substring(col("text"), 1, 24).cast("binary")).as("md5_hex"),
            sha2(substring(col("text"), 1, 24).cast("binary"), 256)
              .as("sha256_hex"),
            length(substring(col("text"), 1, 24)).cast("long").as("n_chars"))
          .orderBy("doc_id")
    },

    // Numeric base conversion panel (round 13, cont.): binary / hex /
    // octal renderings of integer keys — the radix primitives behind
    // bitmap debugging, shard-id displays and file-name encodings.
    // Dialect pins: hex is case-normalized via lower() (Spark and
    // DuckDB both emit uppercase today, but the contract shouldn't
    // hinge on it); octal is Spark conv(x,10,8) ≡ DuckDB to_base(x,8);
    // none of the three zero-pad for positive inputs in either engine.
    // Bounded supplier-dimension frame.
    Q("fn_base_conv",
      """SELECT s_suppkey,
        |       bin(s_suppkey) AS b2,
        |       lower(hex(s_suppkey)) AS b16,
        |       to_base(s_suppkey, 8) AS b8
        |FROM supplier ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      graft.Tables(s, d, "supplier")
        .select(col("s_suppkey"),
          bin(col("s_suppkey")).as("b2"),
          lower(hex(col("s_suppkey"))).as("b16"),
          conv(col("s_suppkey").cast("string"), 10, 8).as("b8"))
        .orderBy("s_suppkey")
    },

    // Calendar month arithmetic panel (round 13, cont.): add-months
    // with END-OF-MONTH CLAMPING (Jan 31 + 1 month = Feb 28/29 — both
    // engines clamp rather than overflow) and the integer month index
    // y·12+m — the portable month-diff spelling (Spark has no integer
    // month datediff; DuckDB's date_diff counts boundary crossings —
    // y·12+m subtraction is the one form both engines compute
    // identically from date parts). Bounded first-200-orders frame.
    Q("fn_month_arith",
      """SELECT o_orderkey,
        |       CAST(o_orderdate AS DATE) AS d0,
        |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE)
        |         AS plus1m,
        |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
        |         AS plus3m,
        |       CAST(year(o_orderdate) * 12 + month(o_orderdate)
        |            - (1992 * 12 + 1) AS BIGINT) AS month_index
        |FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""".stripMargin) {
      (s, d) =>
      graft.Tables(s, d, "orders")
        .where(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
          col("o_orderdate").cast("date").as("d0"),
          add_months(col("o_orderdate").cast("date"), 1).as("plus1m"),
          add_months(col("o_orderdate").cast("date"), 3).as("plus3m"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))
            - lit(1992 * 12 + 1)).cast("long").as("month_index"))
        .orderBy("o_orderkey")
    },

    // TRY_CAST policy panel (round 13, cont.): malformed casts return
    // NULL instead of failing the job — the ingestion-hardening surface
    // every schema-on-read pipeline leans on. Pinned to the PORTABLE
    // subset: integral strings round-trip, alphabetic strings null,
    // calendar-invalid dates null (p_size drives a real valid/invalid
    // date mix — sizes past 28 overflow February). The decimal-string→
    // int case is EXCLUDED by design: DuckDB rounds ('12.5'→13) where
    // Spark's ANSI try_cast nulls — a documented dialect divergence,
    // not a portable contract.
    Q("fn_try_cast",
      """SELECT p_partkey,
        |       try_cast(CAST(p_partkey AS VARCHAR) AS BIGINT)
        |         AS key_roundtrip,
        |       try_cast(p_brand AS BIGINT) AS brand_as_int,
        |       try_cast('1995-02-' || lpad(CAST(p_size AS VARCHAR), 2, '0')
        |                AS DATE) AS date_from_size,
        |       try_cast(p_type AS DOUBLE) AS type_as_double
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      graft.Tables(s, d, "part")
        .select(col("p_partkey"),
          expr("try_cast(CAST(p_partkey AS STRING) AS BIGINT)")
            .as("key_roundtrip"),
          expr("try_cast(p_brand AS BIGINT)").as("brand_as_int"),
          expr("""try_cast(concat('1995-02-',
                 |  lpad(CAST(p_size AS STRING), 2, '0')) AS DATE)"""
            .stripMargin).as("date_from_size"),
          expr("try_cast(p_type AS DOUBLE)").as("type_as_double"))
        .orderBy("p_partkey")
    },

    // R6 app-version-style string parsing + general string ops. The split
    // result is re-joined with ',' in the DECLARED output (and
    // array_to_string in the oracle) because the driver's pandas comparator
    // cannot hash ARRAY cells; ArrayOutputSpec keeps the array form tested.
    Q("fn_string",
      """SELECT p_partkey,
        |       lower(p_name) AS lo, upper(p_brand) AS up,
        |       CAST(length(p_name) AS BIGINT) AS len,
        |       substring(p_name, 1, 8) AS pre,
        |       replace(p_type, ' ', '_') AS ty,
        |       concat(p_brand, ':', p_type) AS br_ty,
        |       trim('  ' || p_brand || ' ') AS trimmed,
        |       regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
        |       array_to_string(string_split(p_type, ' '), ',') AS words
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        lower(col("p_name")).as("lo"), upper(col("p_brand")).as("up"),
        length(col("p_name")).cast("long").as("len"),
        substring(col("p_name"), 1, 8).as("pre"),
        regexp_replace(col("p_type"), " ", "_").as("ty"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("br_ty"),
        trim(concat(lit("  "), col("p_brand"), lit(" "))).as("trimmed"),
        regexp_extract(col("p_type"), "([A-Z]+)", 1).as("first_word"),
        concat_ws(",", split(col("p_type"), " ")).as("words"))
        .orderBy("p_partkey")
    },

    // R4/R5 date kit — month bucketing, diffs, month arithmetic, epoch.
    Q("fn_date",
      """SELECT o_orderkey,
        |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        |       CAST(extract(year FROM o_orderdate) AS BIGINT) AS yr,
        |       CAST(extract(month FROM o_orderdate) AS BIGINT) AS mth,
        |       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
        |       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s,
        |       CAST(o_orderdate AS DATE) AS od
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("month"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mth"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long")
          .as("days_since"),
        add_months(col("o_orderdate"), 3).as("plus3m"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        col("o_orderdate").cast("date").as("od"))
        .orderBy("o_orderkey")
    },

    Q("fn_math",
      """SELECT l_orderkey, l_linenumber,
        |       round(l_extendedprice, 1) AS r1,
        |       abs(l_discount - 0.05) AS ad,
        |       CAST(ceil(l_quantity / 7) AS BIGINT) AS ce,
        |       CAST(floor(l_quantity / 7) AS BIGINT) AS fl,
        |       round(ln(l_extendedprice), 6) AS lnp,
        |       round(log10(l_extendedprice), 6) AS lg,
        |       round(pow(l_quantity, 2), 2) AS sq,
        |       l_linenumber % 3 AS md,
        |       CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, r1, ad, sq, md""".stripMargin) { (s, d) =>
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 1).as("r1"),
        abs(col("l_discount") - 0.05).as("ad"),
        ceil(col("l_quantity") / 7).as("ce"),
        floor(col("l_quantity") / 7).as("fl"),
        round(log(col("l_extendedprice")), 6).as("lnp"),
        round(log10(col("l_extendedprice")), 6).as("lg"),
        round(pow(col("l_quantity"), 2), 2).as("sq"),
        (col("l_linenumber") % 3).as("md"),
        signum(col("l_discount") - 0.05).cast("double").as("sg"))
        .orderBy("l_orderkey", "l_linenumber", "r1", "ad", "sq", "md")
    },

    // Indicator derivations: CASE ladder, coalesce/nullif, greatest/least.
    Q("fn_conditional",
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice < 50000 THEN 'S'
        |            WHEN o_totalprice < 150000 THEN 'M'
        |            WHEN o_totalprice < 300000 THEN 'L'
        |            ELSE 'XL' END AS band,
        |       COALESCE(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
        |       greatest(o_totalprice, 150000.0) AS hi,
        |       least(o_totalprice, 150000.0) AS lo
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") < 50000, "S")
          .when(col("o_totalprice") < 150000, "M")
          .when(col("o_totalprice") < 300000, "L")
          .otherwise("XL").as("band"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open"))
          .as("status_or_open"),
        greatest(col("o_totalprice"), lit(150000.0)).as("hi"),
        least(col("o_totalprice"), lit(150000.0)).as("lo"))
        .orderBy("o_orderkey")
    },

    // R10: typed extraction from the JSON property bag.
    Q("fn_json",
      """SELECT event_id,
        |       json_extract_string(props, '$.k') AS k_str,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_int"))
        .orderBy("event_id")
    },

    // The Spark-4-native semi-structured path (R10): parse the property
    // bag ONCE into a VARIANT (binary-encoded, shreddable) and extract
    // typed fields from it — at 100 TB the parse is a single pass and
    // every extraction reads the binary encoding, vs get_json_object
    // re-parsing the raw text per call. Same answer (and same-shaped
    // oracle) as fn_json; the DECLARED columns are plain string/bigint
    // so DuckDB compares values, not encodings.
    Q("fn_json_variant",
      """SELECT event_id,
        |       json_extract_string(props, '$.k') AS k_str,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(
          col("event_id"),
          try_variant_get(col("v"), "$.k", "string").as("k_str"),
          try_variant_get(col("v"), "$.k", "long").as("k_int"))
        .orderBy("event_id")
    },

    // NS: array kit over the embedding column — higher-order fns, no UDF.
    // Float-array outputs are projected to comma-joined MICRO-INTEGER
    // strings (round(x·10⁶) per element): the driver's comparator cannot
    // hash ARRAY cells, and float→string formatting differs between engines
    // (Spark uses E-notation below 1e-3) while BIGINT→string is identical.
    Q("fn_array",
      """SELECT vec_id,
        |       CAST(len(embedding) AS BIGINT) AS dim,
        |       array_to_string(list_transform(embedding[1:4],
        |         x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)), ',') AS first4,
        |       array_to_string(list_transform(list_sort(embedding[1:4]),
        |         x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)), ',') AS sorted4,
        |       round(list_sum(list_transform(embedding,
        |             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS l2sq
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      val micro: Column => Column = a =>
        concat_ws(",", transform(a, x => round(x.cast("double") * 1000000).cast("long")))
      t(s, d, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        micro(slice(col("embedding"), 1, 4)).as("first4"),
        micro(sort_array(slice(col("embedding"), 1, 4))).as("sorted4"),
        round(
          aggregate(
            transform(col("embedding"), x => x.cast("double") * x.cast("double")),
            lit(0.0),
            (acc, x) => acc + x),
          6).as("l2sq"))
        .orderBy("vec_id")
    },

    // Edit distance (round 5): levenshtein — the fuzzy-match primitive
    // behind entity resolution and typo-tolerant dedup. Both engines
    // implement the same integer DP, so the values compare exactly; the
    // declared shape is a probe-string nearest-20 (map-side distance +
    // TakeOrderedAndProject). At corpus scale the O(n) probe stays one
    // scan; pairwise fuzzy JOINS would go through a blocking key first
    // (the minhash/simhash families here), never raw O(n²) levenshtein.
    Q("fn_edit_distance",
      """SELECT c_custkey, c_name,
        |       CAST(levenshtein(c_name, 'Customer#000000123') AS BIGINT) AS dist
        |FROM customer
        |ORDER BY dist, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .select(col("c_custkey"), col("c_name"),
          levenshtein(col("c_name"), lit("Customer#000000123")).cast("long")
            .as("dist"))
        .orderBy("dist", "c_custkey")
        .limit(20)
    },

    // Jaro-Winkler fuzzy match (round 10): the prefix-weighted scorer
    // entity resolution ranks with — levenshtein counts raw edits, JW
    // rewards agreeing prefixes (where human-keyed names/IDs agree).
    // Spark has no built-in [SPARK]; graft.JaroWinkler is a native
    // codegen Expression (one static call inside WholeStageCodegen, the
    // levenshtein pattern) matching DuckDB's jaro_winkler_similarity
    // definition: window max(l1,l2)/2-1, half-transpositions/2, boost
    // 0.1 on <=4 prefix above the 0.7 threshold. Ranking uses the
    // ROUNDED score + custkey tie-break (the fn_edit_distance shape);
    // also SQL-registered as jaro_winkler via GraftExtensions.
    Q("fn_jaro_winkler",
      """SELECT c_custkey, c_name,
        |       round(jaro_winkler_similarity(c_name, 'Customer#000000123'), 6)
        |         AS jw
        |FROM customer
        |ORDER BY jw DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.graft.JaroWinkler.jaroWinkler
      t(s, d, "customer")
        .select(col("c_custkey"), col("c_name"),
          round(jaroWinkler(col("c_name"), lit("Customer#000000123")), 6)
            .as("jw"))
        .orderBy(col("jw").desc, col("c_custkey"))
        .limit(20)
    },

    // R9/NS: content hashing for dedup keys.
    Q("fn_hash",
      """SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        md5(col("text")).as("h_md5"),
        sha2(col("text"), 256).as("h_sha"))
        .orderBy("doc_id")
    },

    // Bitwise ops (round 5): mask/shift/popcount — the flag-field and
    // hash-partition arithmetic of R9/NS (simhash segments, z-order
    // interleaves, bloom bit probes all reduce to these). Pure codegen
    // integer ops, bit-exact cross-engine by construction.
    Q("fn_bitwise",
      """SELECT event_id,
        |       event_id & 255 AS masked,
        |       event_id | 4096 AS flagged,
        |       xor(event_id, 21845) AS mixed,
        |       event_id << 3 AS shl,
        |       event_id >> 2 AS shr,
        |       CAST(bit_count(event_id) AS BIGINT) AS pop
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        col("event_id").bitwiseAND(lit(255L)).as("masked"),
        col("event_id").bitwiseOR(lit(4096L)).as("flagged"),
        col("event_id").bitwiseXOR(lit(21845L)).as("mixed"),
        shiftleft(col("event_id"), 3).as("shl"),
        shiftright(col("event_id"), 2).as("shr"),
        bit_count(col("event_id")).cast("long").as("pop"))
        .orderBy("event_id")
    },

    // R1: dirty-ingest casts — try_cast null-on-error.
    Q("fn_cast",
      """SELECT event_id,
        |       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
        |       TRY_CAST(event_type AS BIGINT) AS bad_int,
        |       CAST(ts AS DATE) AS ev_date,
        |       CAST(user_id AS DOUBLE) AS user_dbl
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        expr("try_cast(get_json_object(props, '$.k') AS LONG)").as("k_int"),
        expr("try_cast(event_type AS LONG)").as("bad_int"),
        col("ts").cast("date").as("ev_date"),
        col("user_id").cast("double").as("user_dbl"))
        .orderBy("event_id")
    },

    // R10/NS: UDTF-class explode array → rows.
    Q("fn_explode",
      """SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |FROM documents ORDER BY doc_id, word""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .orderBy("doc_id", "word")
    },

    // URL decomposition (round 11): scheme/host/path/query/fragment via
    // one anchored regex — Spark ships parse_url but DuckDB does not,
    // so the PORTABLE form is a capture-group regexp_extract chain
    // (RE2-safe: no backrefs/lookarounds), which is also what a crawl
    // pipeline's host-bucketing actually runs. URLs are planted
    // deterministically from order rows (every component present, so
    // every group participates in the match on both engines);
    // o_orderkey < 2000 bounds the report at every SF.
    Q("fn_url_parse", {
      val url = "'https://shop' || CAST(o_custkey % 10 AS VARCHAR) || " +
        "'.example.com/order/' || CAST(o_orderkey AS VARCHAR) || " +
        "'?src=em' || CAST(o_orderkey % 5 AS VARCHAR) || '#s' || " +
        "CAST(o_orderkey % 3 AS VARCHAR)"
      val pat = "^([a-z]+)://([^/?#]+)([^?#]*)\\?([^#]*)#(.*)$"
      s"""WITH u AS (
         |  SELECT o_orderkey, $url AS url FROM orders WHERE o_orderkey < 2000
         |)
         |SELECT o_orderkey,
         |       regexp_extract(url, '$pat', 1) AS scheme,
         |       regexp_extract(url, '$pat', 2) AS host,
         |       regexp_extract(url, '$pat', 3) AS path,
         |       regexp_extract(url, '$pat', 4) AS query,
         |       regexp_extract(url, '$pat', 5) AS fragment
         |FROM u ORDER BY o_orderkey""".stripMargin
    }) { (s, d) =>
      val url = concat(lit("https://shop"),
        (col("o_custkey") % 10).cast("string"),
        lit(".example.com/order/"), col("o_orderkey").cast("string"),
        lit("?src=em"), (col("o_orderkey") % 5).cast("string"),
        lit("#s"), (col("o_orderkey") % 3).cast("string"))
      val pat = "^([a-z]+)://([^/?#]+)([^?#]*)\\?([^#]*)#(.*)$"
      t(s, d, "orders")
        .where(col("o_orderkey") < 2000)
        .select(col("o_orderkey"), url.as("url"))
        .select(col("o_orderkey"),
          regexp_extract(col("url"), pat, 1).as("scheme"),
          regexp_extract(col("url"), pat, 2).as("host"),
          regexp_extract(col("url"), pat, 3).as("path"),
          regexp_extract(col("url"), pat, 4).as("query"),
          regexp_extract(col("url"), pat, 5).as("fragment"))
        .orderBy("o_orderkey")
    },

    // IPv4 parse + classification (round 12): the log-enrichment scalar
    // every clickstream/flow pipeline runs — octet split, numeric /32
    // form, /24 subnet bucket, RFC-1918 private-range flag. Addresses
    // are planted deterministically from order keys (both engines build
    // the identical string), so any split/arith/range defect
    // hash-mismatches. One codegen'd expression chain over the scan —
    // no UDF, no shuffle beyond the bounded orderBy.
    Q("fn_ip_parse", {
      val ip = "CAST(CASE WHEN o_orderkey % 3 = 0 THEN 10 " +
        "WHEN o_orderkey % 3 = 1 THEN 172 ELSE 203 END AS VARCHAR) || " +
        "'.' || CAST(CASE WHEN o_orderkey % 3 = 1 THEN " +
        "16 + o_orderkey % 16 ELSE o_orderkey % 256 END AS VARCHAR) || " +
        "'.' || CAST((o_orderkey // 7) % 256 AS VARCHAR) || " +
        "'.' || CAST(1 + o_orderkey % 254 AS VARCHAR)"
      s"""WITH u AS (
         |  SELECT o_orderkey, $ip AS ip FROM orders WHERE o_orderkey < 2000
         |), o AS (
         |  SELECT o_orderkey, ip,
         |         CAST(string_split(ip, '.')[1] AS BIGINT) AS o1,
         |         CAST(string_split(ip, '.')[2] AS BIGINT) AS o2,
         |         CAST(string_split(ip, '.')[3] AS BIGINT) AS o3,
         |         CAST(string_split(ip, '.')[4] AS BIGINT) AS o4
         |  FROM u
         |)
         |SELECT o_orderkey, ip,
         |       CAST(o1 * 16777216 + o2 * 65536 + o3 * 256 + o4 AS BIGINT)
         |         AS ip_num,
         |       string_split(ip, '.')[1] || '.' || string_split(ip, '.')[2]
         |         || '.' || string_split(ip, '.')[3] || '.0/24' AS subnet24,
         |       CAST(CASE WHEN o1 = 10 THEN 1
         |            WHEN o1 = 172 AND o2 BETWEEN 16 AND 31 THEN 1
         |            WHEN o1 = 192 AND o2 = 168 THEN 1
         |            ELSE 0 END AS BIGINT) AS is_private
         |FROM o ORDER BY o_orderkey""".stripMargin
    }) { (s, d) =>
      val ip = concat(
        when(col("o_orderkey") % 3 === 0, 10)
          .when(col("o_orderkey") % 3 === 1, 172)
          .otherwise(203).cast("string"),
        lit("."),
        when(col("o_orderkey") % 3 === 1, lit(16) + col("o_orderkey") % 16)
          .otherwise(col("o_orderkey") % 256).cast("string"),
        lit("."), (floor(col("o_orderkey") / 7) % 256).cast("long")
          .cast("string"),
        lit("."), (lit(1) + col("o_orderkey") % 254).cast("string"))
      val oc = split(col("ip"), "\\.")
      def o(i: Int) = element_at(oc, i).cast("long")
      t(s, d, "orders")
        .where(col("o_orderkey") < 2000)
        .select(col("o_orderkey"), ip.as("ip"))
        .select(col("o_orderkey"), col("ip"),
          (o(1) * 16777216L + o(2) * 65536L + o(3) * 256L + o(4))
            .as("ip_num"),
          concat(element_at(oc, 1), lit("."), element_at(oc, 2),
            lit("."), element_at(oc, 3), lit(".0/24")).as("subnet24"),
          when(o(1) === 10, 1L)
            .when(o(1) === 172 && o(2).between(16, 31), 1L)
            .when(o(1) === 192 && o(2) === 168, 1L)
            .otherwise(0L).as("is_private"))
        .orderBy("o_orderkey")
    }
  )
}
