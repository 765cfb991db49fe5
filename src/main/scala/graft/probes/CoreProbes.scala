package graft.probes

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Probes for SURVEY.md §2.1 (scans), §2.2 (projection/filter), §2.6
  * (sort/limit), §2.7 (set ops), §2.8 (scalar functions) and §2.11 (CRUD
  * rewrite shapes). Each mirrors a reference operator; citations are on the
  * individual probes.
  */
object CoreProbes {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val all: Seq[Probe] = Seq(

    // S2 — batch backfill scan (reference main.py:41-49).
    Probe(
      "s2_batch_scan_count",
      "SELECT count(*) AS cnt FROM lineitem"
    ) { (s, d) => t(s, d, "lineitem").agg(count(lit(1)).as("cnt")) },

    // S6/O3 — full scan with ORDER BY + OFFSET/LIMIT pagination
    // (reference base.py:31-36, default skip=0 limit=100).
    Probe(
      "s6_pagination",
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 100 OFFSET 10"
    ) { (s, d) =>
      t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey").offset(10).limit(100)
    },

    // S7/F1/O4 — point lookup by PK (reference base.py:24-29).
    Probe(
      "s7_point_lookup",
      "SELECT p_partkey, p_name, p_brand, p_retailprice FROM part WHERE p_partkey = 42"
    ) { (s, d) =>
      t(s, d, "part").select("p_partkey", "p_name", "p_brand", "p_retailprice")
        .filter(col("p_partkey") === 42).limit(1)
    },

    // S9 — append-sink semantics: base ∪ new rows (reference base.py:13-22).
    Probe(
      "s9_append_union",
      "SELECT count(*) AS cnt FROM (SELECT o_orderkey FROM orders UNION ALL SELECT o_orderkey + 1000000000 AS o_orderkey FROM orders WHERE o_orderkey <= 50) t"
    ) { (s, d) =>
      val base = t(s, d, "orders").select("o_orderkey")
      val appended = t(s, d, "orders").filter(col("o_orderkey") <= 50)
        .select((col("o_orderkey") + 1000000000L).as("o_orderkey"))
      base.unionAll(appended).agg(count(lit(1)).as("cnt"))
    },

    // P1 — column projection (reference repository.py:51-57).
    Probe(
      "p1_projection",
      "SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey"
    ) { (s, d) =>
      t(s, d, "customer").select("c_custkey", "c_name", "c_mktsegment")
        .repartition(1).sortWithinPartitions("c_custkey")
    },

    // P4 — derived-column enrichment (reference main.py:72-76).
    // (doubling keeps the value exactly representable, so round() is
    // engine-agnostic — a 0.9 factor lands on half-cent ties where Spark's
    // HALF_UP-on-decimal-string and DuckDB's binary rounding disagree)
    Probe(
      "p4_derived_column",
      "SELECT o_orderkey, round(o_totalprice * 2, 2) AS discounted FROM orders ORDER BY o_orderkey"
    ) { (s, d) =>
      t(s, d, "orders")
        .withColumn("discounted", round(col("o_totalprice") * 2, 2))
        .select("o_orderkey", "discounted").repartition(1).sortWithinPartitions("o_orderkey")
    },

    // F1 — equality predicate on PK (reference base.py:26).
    Probe(
      "f1_point_filter",
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey = 7"
    ) { (s, d) =>
      t(s, d, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
        .filter(col("o_orderkey") === 7)
    },

    // F2/O1 — FK filter + ORDER BY ordinal (reference repository.py:94-95).
    Probe(
      "f2_fk_filter",
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_orderkey = 7 ORDER BY l_linenumber"
    ) { (s, d) =>
      t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
        .filter(col("l_orderkey") === 7).repartition(1).sortWithinPartitions("l_linenumber")
    },

    // F3 — closed range on ordinal, bounds optional (repository.py:97-100).
    Probe(
      "f3_range_between",
      "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_linenumber BETWEEN 2 AND 4 ORDER BY l_orderkey, l_linenumber"
    ) { (s, d) =>
      t(s, d, "lineitem").filter(col("l_linenumber").between(2, 4))
        .select("l_orderkey", "l_linenumber").repartition(1).sortWithinPartitions("l_orderkey", "l_linenumber")
    },

    // F4 — set-membership predicate (reference main.py:48,55).
    Probe(
      "f4_in_set",
      "SELECT o_orderkey FROM orders WHERE o_orderstatus IN ('F','O') ORDER BY o_orderkey"
    ) { (s, d) =>
      t(s, d, "orders").filter(col("o_orderstatus").isin("F", "O"))
        .select("o_orderkey").repartition(1).sortWithinPartitions("o_orderkey")
    },

    // F5 — existence guard / isEmpty check (reference api.py:111-112).
    Probe(
      "f5_exists_guard",
      "SELECT CASE WHEN count(*) > 0 THEN 1 ELSE 0 END AS present FROM orders WHERE o_orderkey = 42"
    ) { (s, d) =>
      t(s, d, "orders").filter(col("o_orderkey") === 42)
        .agg(count(lit(1)).as("c"))
        .select(when(col("c") > 0, lit(1)).otherwise(lit(0)).as("present"))
    },

    // F6/C13 — null-safe guards (reference repository.py:23, pdf_parser.py:158).
    Probe(
      "f6_null_guard",
      "SELECT event_id, coalesce(nullif(event_type, 'error'), 'none') AS et FROM events ORDER BY event_id"
    ) { (s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          coalesce(nullif(col("event_type"), lit("error")), lit("none")).as("et"))
        .repartition(1).sortWithinPartitions("event_id")
    },

    // O3 — top-k by score ([EXT], SURVEY §2.6 note).
    Probe(
      "o3_topk",
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
    ) { (s, d) =>
      t(s, d, "orders").select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(10)
    },

    // O4 — first-row limit (reference base.py:26 `.first()`).
    Probe(
      "o4_limit1",
      "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey = 1 LIMIT 1"
    ) { (s, d) =>
      t(s, d, "orders").select("o_orderkey", "o_orderstatus")
        .filter(col("o_orderkey") === 1).limit(1)
    },

    // §2.7 — set operations (absent in reference; free in the engine).
    Probe(
      "set_union_distinct",
      "SELECT count(*) AS cnt FROM (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F' UNION SELECT o_orderkey FROM orders WHERE o_totalprice > 250000) t"
    ) { (s, d) =>
      val o = t(s, d, "orders")
      o.filter(col("o_orderstatus") === "F").select("o_orderkey")
        .union(o.filter(col("o_totalprice") > 250000).select("o_orderkey"))
        .distinct().agg(count(lit(1)).as("cnt"))
    },

    Probe(
      "set_except",
      "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F' EXCEPT SELECT o_orderkey FROM orders WHERE o_totalprice > 250000 ORDER BY o_orderkey"
    ) { (s, d) =>
      val o = t(s, d, "orders")
      o.filter(col("o_orderstatus") === "F").select("o_orderkey")
        .except(o.filter(col("o_totalprice") > 250000).select("o_orderkey"))
        .orderBy("o_orderkey")
    },

    Probe(
      "set_intersect",
      "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F' INTERSECT SELECT o_orderkey FROM orders WHERE o_totalprice > 250000 ORDER BY o_orderkey"
    ) { (s, d) =>
      val o = t(s, d, "orders")
      o.filter(col("o_orderstatus") === "F").select("o_orderkey")
        .intersect(o.filter(col("o_totalprice") > 250000).select("o_orderkey"))
        .orderBy("o_orderkey")
    },

    // C1/C3 — object-store key construction + basename (minio.py:46, main.py:98).
    Probe(
      "c1_key_basename",
      "SELECT o_orderkey, 'documents/' || o_custkey || '/charts/' || o_orderkey || '.png' AS obj_key, regexp_extract('documents/' || o_custkey || '/charts/' || o_orderkey || '.png', '([^/]+)$', 1) AS basename FROM orders ORDER BY o_orderkey"
    ) { (s, d) =>
      val key = format_string("documents/%d/charts/%d.png", col("o_custkey"), col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_orderkey"), key.as("obj_key"),
          regexp_extract(key, "([^/]+)$", 1).as("basename"))
        .repartition(1).sortWithinPartitions("o_orderkey")
    },

    // C2 — lower() (reference main.py:48).
    Probe(
      "c2_lower",
      "SELECT r_regionkey, lower(r_name) AS r_lower FROM region ORDER BY r_regionkey"
    ) { (s, d) =>
      t(s, d, "region").select(col("r_regionkey"), lower(col("r_name")).as("r_lower"))
        .repartition(1).sortWithinPartitions("r_regionkey")
    },

    // C4 — strftime-style formatting (reference main.py:75).
    Probe(
      "c4_date_format",
      "SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS od FROM orders ORDER BY o_orderkey"
    ) { (s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("od"))
        .repartition(1).sortWithinPartitions("o_orderkey")
    },

    // C5/C6 — timestamp normalization + ISO render (reference demo.py:11-14).
    Probe(
      "c6_ts_epoch",
      "SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s FROM events ORDER BY event_id"
    ) { (s, d) =>
      t(s, d, "events")
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
        .repartition(1).sortWithinPartitions("event_id")
    },

    // C5 — Jakarta-time rendering at the presentation edge (schema.py:8-9
    // get_jakarta_time; storage stays UTC per SURVEY §7.5). Jakarta is a
    // fixed UTC+7 zone, which the oracle reproduces with interval math.
    Probe(
      "c5_jakarta_render",
      "SELECT event_id, strftime(CAST(ts AS TIMESTAMP) + INTERVAL 7 HOUR, '%Y-%m-%d %H:%M:%S') AS jkt FROM events ORDER BY event_id"
    ) { (s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          date_format(from_utc_timestamp(col("ts"), "Asia/Jakarta"),
            "yyyy-MM-dd HH:mm:ss").as("jkt"))
        .repartition(1).sortWithinPartitions("event_id")
    },

    // S3 — glob listing scan (file_sensor.py:24-26): binaryFile metadata
    // over the testdata directory. The glob's expected file set is the
    // fixed ten-table layout, so the oracle is a literal VALUES list
    // (absolute paths and byte sizes are host/sf-dependent and excluded);
    // the probe also guards non-emptiness of each file via length > 0.
    Probe(
      "s3_glob_listing",
      "SELECT basename FROM (VALUES ('customer.parquet'), ('documents.parquet'), ('embeddings.parquet'), ('events.parquet'), ('lineitem.parquet'), ('nation.parquet'), ('orders.parquet'), ('part.parquet'), ('region.parquet'), ('supplier.parquet')) t(basename) ORDER BY basename"
    ) { (s, d) =>
      s.read.format("binaryFile").load(s"$d/*.parquet")
        .filter(col("length") > 0)
        .select(element_at(split(col("path"), "/"), -1).as("basename"))
        .repartition(1).sortWithinPartitions("basename")
    },

    // C8 — JSON path extraction (schema.py JSON columns; demo.py:70,86,97).
    Probe(
      "c8_json_extract",
      "SELECT event_id, json_extract_string(props, '$.k') AS k FROM events ORDER BY event_id"
    ) { (s, d) =>
      t(s, d, "events")
        .select(col("event_id"), get_json_object(col("props"), "$.k").as("k"))
        .repartition(1).sortWithinPartitions("event_id")
    },

    // C9 — struct construction + field access (pdf_parser.py:152-160).
    Probe(
      "c9_struct_roundtrip",
      "SELECT o_orderkey, (struct_pack(k := o_orderkey, v := o_totalprice)).v AS unpacked FROM orders ORDER BY o_orderkey"
    ) { (s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"),
          struct(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
            .getField("v").as("unpacked"))
        .repartition(1).sortWithinPartitions("o_orderkey")
    },

    // C12 — type-dispatch conditional (pdf_parser.py:142,162 isinstance).
    Probe(
      "c12_case_when",
      "SELECT event_id, CASE WHEN event_type = 'error' THEN 'E' WHEN event_type = 'purchase' THEN 'P' ELSE 'O' END AS cls FROM events ORDER BY event_id"
    ) { (s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          when(col("event_type") === "error", "E")
            .when(col("event_type") === "purchase", "P")
            .otherwise("O").as("cls"))
        .repartition(1).sortWithinPartitions("event_id")
    },

    // M1 — update-by-PK as copy-on-write rewrite expression (base.py:38-52);
    // the storage-level atomic swap lives in graft.store.TableStore.
    Probe(
      "m1_update_rewrite",
      "SELECT o_orderkey, CASE WHEN o_orderkey = 42 THEN 'URGENT-PATCHED' ELSE o_orderpriority END AS o_orderpriority FROM orders ORDER BY o_orderkey"
    ) { (s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderkey") === 42, "URGENT-PATCHED")
            .otherwise(col("o_orderpriority")).as("o_orderpriority"))
        .repartition(1).sortWithinPartitions("o_orderkey")
    },

    // M4 — keyed upsert (MERGE) through the REAL storage path: orders is
    // copied range-clustered into a scratch TableStore (tight per-file
    // key ranges → the patch batch hits a few files, the shape a corpus
    // upsert has), then TableStore.merge applies a contiguous band of
    // updates ([1000, 2999] every 10th key → 'MERGED') plus inserts
    // (every 97th key shifted by 1e6 → 'INSERTED'), taking the
    // FILE-PRUNED commit path (MergeSpec pins the rename accounting).
    // The oracle recomputes the upsert as a FULL OUTER JOIN (the batch
    // form of the reference's read-mutate-flush session, base.py:38-52).
    Probe(
      "m3_merge_upsert",
      // insert keys offset by max(o_orderkey) — the same sf-robust key
      // derivation as m5/m6: a fixed +1e6 lands inside the real key
      // space at sf>=1 (well-defined but a different query than
      // intended — inserts silently become updates)
      "WITH mx AS (SELECT max(o_orderkey) AS m FROM orders), src AS (" +
        "SELECT o_orderkey, 'MERGED' AS o_orderpriority FROM orders WHERE o_orderkey BETWEEN 1000 AND 2999 AND o_orderkey % 10 = 0 " +
        "UNION ALL SELECT o_orderkey + (SELECT m FROM mx), 'INSERTED' FROM orders WHERE o_orderkey % 97 = 0) " +
        "SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey, " +
        "CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderpriority ELSE t.o_orderpriority END AS o_orderpriority " +
        "FROM orders t FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey " +
        "ORDER BY o_orderkey"
    ) { (s, d) =>
      val root = Probe.scratchDir("graft-merge-probe")
      val ts = new graft.store.TableStore(s, root)
      val orders = t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority"))
      PhaseTimer.timed("m3_merge_upsert", "table_setup_write") {
        ts.overwriteAtomic("orders_m",
          orders.repartitionByRange(16, col("o_orderkey"))
            .sortWithinPartitions("o_orderkey"))
      }
      val mx = orders.agg(max(col("o_orderkey")).cast("long")).head().getLong(0)
      val src = orders
        .filter(col("o_orderkey").between(1000L, 2999L) &&
          col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("MERGED").as("o_orderpriority"))
        .unionByName(orders.filter(col("o_orderkey") % 97 === 0)
          .select((col("o_orderkey") + mx).as("o_orderkey"),
            lit("INSERTED").as("o_orderpriority")))
      PhaseTimer.timed("m3_merge_upsert", "merge") {
        ts.merge("orders_m", src, Seq("o_orderkey"))
      }
      ts.read("orders_m").repartition(1).sortWithinPartitions("o_orderkey")
    },

    // [EXT] M6 — CDC apply through the REAL storage path (r12): one
    // changefeed of upserts + inserts + tombstones (incl. tombstones for
    // absent keys, which must no-op) applied by mergeCdc's pruned
    // machinery; the oracle is the FULL OUTER JOIN with the delete
    // filter — the declarative definition of MERGE-with-DELETE.
    Probe(
      "m5_merge_cdc",
      // the two synthetic key spaces (inserted keys, absent-key
      // tombstones) are offset by max(o_orderkey) and 2*max so they stay
      // disjoint from the table AND each other at EVERY scale factor —
      // fixed +1e6/+2e6 offsets collided at sf>=1 (o%97==0 shifted by
      // 1e6 can equal o'%501==0 shifted by 2e6), tripping the feed's
      // key-uniqueness contract on a probe bug, not an engine bug
      "WITH mx AS (SELECT max(o_orderkey) AS m FROM orders), src AS (" +
        "SELECT o_orderkey, 'MERGED' AS o_orderpriority, false AS del FROM orders WHERE o_orderkey BETWEEN 1000 AND 2999 AND o_orderkey % 10 = 0 " +
        "UNION ALL SELECT o_orderkey + (SELECT m FROM mx), 'INSERTED', false FROM orders WHERE o_orderkey % 97 = 0 " +
        "UNION ALL SELECT o_orderkey, NULL, true FROM orders WHERE o_orderkey BETWEEN 5000 AND 7999 AND o_orderkey % 7 = 0 " +
        "UNION ALL SELECT o_orderkey + 2 * (SELECT m FROM mx), NULL, true FROM orders WHERE o_orderkey % 501 = 0) " +
        "SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey, " +
        "CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderpriority ELSE t.o_orderpriority END AS o_orderpriority " +
        "FROM orders t FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey " +
        "WHERE NOT coalesce(s.del, false) ORDER BY o_orderkey"
    ) { (s, d) =>
      val root = Probe.scratchDir("graft-cdc-probe")
      val ts = new graft.store.TableStore(s, root)
      val orders = t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority"))
      PhaseTimer.timed("m5_merge_cdc", "table_setup_write") {
        ts.overwriteAtomic("orders_c",
          orders.repartitionByRange(16, col("o_orderkey"))
            .sortWithinPartitions("o_orderkey"))
      }
      val nullS = lit(null).cast("string")
      // same max-derived offsets as the oracle's mx CTE (see above)
      val mx = orders.agg(max(col("o_orderkey")).cast("long")).head().getLong(0)
      val feed = orders
        .filter(col("o_orderkey").between(1000L, 2999L) &&
          col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("MERGED").as("o_orderpriority"),
          lit(false).as("_deleted"))
        .unionByName(orders.filter(col("o_orderkey") % 97 === 0)
          .select((col("o_orderkey") + mx).as("o_orderkey"),
            lit("INSERTED").as("o_orderpriority"), lit(false).as("_deleted")))
        .unionByName(orders
          .filter(col("o_orderkey").between(5000L, 7999L) &&
            col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), nullS.as("o_orderpriority"),
            lit(true).as("_deleted")))
        .unionByName(orders.filter(col("o_orderkey") % 501 === 0)
          .select((col("o_orderkey") + 2 * mx).as("o_orderkey"),
            nullS.as("o_orderpriority"), lit(true).as("_deleted")))
      PhaseTimer.timed("m5_merge_cdc", "cdc_apply") {
        ts.mergeCdc("orders_c", feed, Seq("o_orderkey"))
      }
      ts.read("orders_c").repartition(1).sortWithinPartitions("o_orderkey")
    },

    // [EXT] M6 streaming form (r13): the SAME changefeed as m5, split
    // into three key-disjoint micro-batches delivered through a real
    // file-source CdcStream (maxFilesPerTrigger=1, AvailableNow) — the
    // at-least-once foreachBatch apply under the writer lease must
    // converge to the SAME full-outer-join oracle as the batch verb.
    // Key-disjoint batches make the final state order-independent, so
    // one oracle covers every trigger interleaving.
    Probe(
      "m6_cdc_stream",
      "WITH mx AS (SELECT max(o_orderkey) AS m FROM orders), src AS (" +
        "SELECT o_orderkey, 'MERGED' AS o_orderpriority, false AS del FROM orders WHERE o_orderkey BETWEEN 1000 AND 2999 AND o_orderkey % 10 = 0 " +
        "UNION ALL SELECT o_orderkey + (SELECT m FROM mx), 'INSERTED', false FROM orders WHERE o_orderkey % 97 = 0 " +
        "UNION ALL SELECT o_orderkey, NULL, true FROM orders WHERE o_orderkey BETWEEN 5000 AND 7999 AND o_orderkey % 7 = 0 " +
        "UNION ALL SELECT o_orderkey + 2 * (SELECT m FROM mx), NULL, true FROM orders WHERE o_orderkey % 501 = 0) " +
        "SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey, " +
        "CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderpriority ELSE t.o_orderpriority END AS o_orderpriority " +
        "FROM orders t FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey " +
        "WHERE NOT coalesce(s.del, false) ORDER BY o_orderkey"
    ) { (s, d) =>
      val root = Probe.scratchDir("graft-cdcstream-probe")
      val ts = new graft.store.TableStore(s, root + "/tables")
      val orders = t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority"))
      PhaseTimer.timed("m6_cdc_stream", "table_setup_write") {
        ts.overwriteAtomic("orders_s",
          orders.repartitionByRange(16, col("o_orderkey"))
            .sortWithinPartitions("o_orderkey"))
      }
      val nullS = lit(null).cast("string")
      val mx = orders.agg(max(col("o_orderkey")).cast("long")).head().getLong(0)
      // three KEY-DISJOINT slices of the m5 feed, one file each → three
      // micro-batches under maxFilesPerTrigger=1
      val batches = Seq(
        orders.filter(col("o_orderkey").between(1000L, 2999L) &&
            col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"), lit("MERGED").as("o_orderpriority"),
            lit(false).as("_deleted")),
        orders.filter(col("o_orderkey") % 97 === 0)
          .select((col("o_orderkey") + mx).as("o_orderkey"),
            lit("INSERTED").as("o_orderpriority"), lit(false).as("_deleted")),
        orders.filter(col("o_orderkey").between(5000L, 7999L) &&
            col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), nullS.as("o_orderpriority"),
            lit(true).as("_deleted"))
          .unionByName(orders.filter(col("o_orderkey") % 501 === 0)
            .select((col("o_orderkey") + 2 * mx).as("o_orderkey"),
              nullS.as("o_orderpriority"), lit(true).as("_deleted"))))
      val feedDir = root + "/feed"
      PhaseTimer.timed("m6_cdc_stream", "feed_write") {
        batches.foreach(_.coalesce(1).write.mode("append").parquet(feedDir))
      }
      PhaseTimer.timed("m6_cdc_stream", "cdc_stream_apply") {
        val feed = s.readStream
          .schema(org.apache.spark.sql.types.StructType.fromDDL(
            "o_orderkey BIGINT, o_orderpriority STRING, _deleted BOOLEAN"))
          .option("maxFilesPerTrigger", "1")
          .parquet(feedDir)
        val q = graft.streaming.CdcStream(ts, "orders_s", feed,
          Seq("o_orderkey"), root + "/ckpt",
          trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
        q.awaitTermination()
      }
      ts.read("orders_s").repartition(1).sortWithinPartitions("o_orderkey")
    },

    // [EXT] M7 — writer-lease TAKEOVER liveness through the probe tier
    // (r14): the recovery path a 100 TB operator actually hits after a
    // driver crash. Writer A acquires the lease with a short TTL and
    // "crashes" (never releases); after expiry writer B takes over via
    // the atomic retire+create-exclusive+verify protocol, the usurped A
    // is refused, and B COMPLETES a merge — whose post-takeover table
    // state must hash-match the closed-form oracle. The 8-racer
    // WriterLeaseSpec cases pin mutual exclusion; this row pins the
    // LIVENESS half: an expired lease never wedges the table, and the
    // new holder's writes land whole.
    Probe(
      "m7_lease_takeover",
      "SELECT o_orderkey, CASE WHEN o_orderkey BETWEEN 2000 AND 3999 " +
        "AND o_orderkey % 13 = 0 THEN 'TAKEN_OVER' ELSE o_orderpriority " +
        "END AS o_orderpriority FROM orders ORDER BY o_orderkey"
    ) { (s, d) =>
      val root = Probe.scratchDir("graft-takeover-probe")
      val a = new graft.store.TableStore(s, root)
      val orders = t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority"))
      PhaseTimer.timed("m7_lease_takeover", "table_setup_write") {
        a.overwriteAtomic("orders_t",
          orders.repartitionByRange(16, col("o_orderkey"))
            .sortWithinPartitions("o_orderkey"))
      }
      PhaseTimer.timed("m7_lease_takeover", "takeover_merge") {
        // A holds, then crashes without releasing
        require(a.acquireWriterLease("orders_t", ttlMs = 250L),
          "writer A must acquire the fresh lease")
        Thread.sleep(450L) // the TTL lapses with no renewal — A is dead
        val b = new graft.store.TableStore(s, root)
        require(b.acquireWriterLease("orders_t"),
          "an expired lease is no lease: B must take over, not wedge")
        require(!a.acquireWriterLease("orders_t"),
          "the usurped writer must be refused while B's lease is live")
        b.merge("orders_t",
          orders.filter(col("o_orderkey").between(2000L, 3999L) &&
              col("o_orderkey") % 13 === 0)
            .select(col("o_orderkey"), lit("TAKEN_OVER").as("o_orderpriority")),
          Seq("o_orderkey"))
        b.releaseWriterLease("orders_t")
      }
      new graft.store.TableStore(s, root).read("orders_t")
        .repartition(1).sortWithinPartitions("o_orderkey")
    },

    // [EXT] M5 — additive schema evolution through the REAL storage path
    // (r12): a table written pre-evolution, evolved with one sidecar
    // write, then appended post-evolution with the new column. The
    // read-back aggregate proves old rows null-fill, new rows carry
    // values, and nothing is lost — the oracle re-derives every figure
    // from the source table and the doc_id<250 phase split in closed
    // form.
    Probe(
      "m4_schema_evolution",
      "SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN doc_id < 250 THEN 1 ELSE 0 END) AS BIGINT) AS n_null_lang, " +
        "CAST(count(DISTINCT CASE WHEN doc_id >= 250 THEN source END) AS BIGINT) AS n_langs, " +
        "CAST(sum(length(text)) AS BIGINT) AS chars " +
        "FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL"
    ) { (s, d) =>
      val root = Probe.scratchDir("graft-evolve-probe")
      val ts = new graft.store.TableStore(s, root)
      val src = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      PhaseTimer.timed("m4_schema_evolution", "writes_evolve") {
        ts.append("docs", src.filter(col("doc_id") < 250)
          .select("doc_id", "text"))
        ts.evolveSchema("docs", "lang STRING")
        ts.append("docs", src.filter(col("doc_id") >= 250)
          .select(col("doc_id"), col("text"), col("source").as("lang")))
      }
      ts.read("docs").agg(
        count(lit(1)).as("n"),
        sum(when(col("lang").isNull, 1L).otherwise(0L)).as("n_null_lang"),
        countDistinct(col("lang")).as("n_langs"),
        sum(length(col("text"))).cast("long").as("chars"))
    },

    // [EXT] ops surface (r13): the metadata-only table report, with
    // every field recomputed in CLOSED FORM by the oracle from the same
    // fixture writes — the partitioned write puts each hash bucket in
    // exactly one task, so files = small_files = partition_dirs =
    // manifest_covered = count(DISTINCT doc_id % 8); the lease is held
    // by this instance ("live-own") and a freshly-written table carries
    // no swap debris. The report itself costs one listing + one sidecar
    // read (no Spark job) — the poll-safety claim TableReportSpec pins.
    Probe(
      "ops_table_report",
      "SELECT CAST(count(DISTINCT doc_id % 8) AS BIGINT) AS files, " +
        "CAST(count(DISTINCT doc_id % 8) AS BIGINT) AS small_files, " +
        "CAST(count(DISTINCT doc_id % 8) AS BIGINT) AS partition_dirs, " +
        "'doc_id' AS stats_cols, " +
        "CAST(count(DISTINCT doc_id % 8) AS BIGINT) AS manifest_covered, " +
        "'live-own' AS lease_state, false AS swap_debris " +
        "FROM documents WHERE doc_id IS NOT NULL"
    ) { (s, d) =>
      val root = Probe.scratchDir("graft-report-probe")
      val ts = new graft.store.TableStore(s, root)
      val docs = t(s, d, "documents").filter(col("doc_id").isNotNull)
        .withColumn("bucket", col("doc_id") % 8)
      PhaseTimer.timed("ops_table_report", "table_setup_write") {
        // each bucket hashes into exactly ONE of the 8 tasks, so every
        // partition dir is written by one task → one file per dir
        ts.appendPartitioned("docs_r",
          docs.repartition(8, col("bucket")), Seq("bucket"))
        ts.declareStatsColumns("docs_r", Seq("doc_id"))
      }
      require(ts.acquireWriterLease("docs_r"), "fresh scratch table")
      val r = ts.tableReport("docs_r")
      import s.implicits._
      Seq((r.files.toLong, r.smallFiles.toLong, r.partitionDirs.toLong,
        r.statsCols, r.manifestCovered.toLong, r.leaseState, r.swapDebris))
        .toDF("files", "small_files", "partition_dirs", "stats_cols",
          "manifest_covered", "lease_state", "swap_debris")
    },

    // M2/J4 — cascade delete as left-anti rewrite (schema.py:43-44).
    Probe(
      "m2_delete_count",
      "SELECT count(*) AS remaining FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')"
    ) { (s, d) =>
      val deleted = t(s, d, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("l_orderkey"))
      t(s, d, "lineitem").join(deleted, Seq("l_orderkey"), "left_anti")
        .agg(count(lit(1)).as("remaining"))
    }
  )

  private def nullif(c: Column, v: Column): Column = when(c === v, lit(null)).otherwise(c)
}
