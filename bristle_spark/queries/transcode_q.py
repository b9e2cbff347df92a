"""Group T — transcode-semantics declared queries (SURVEY.md §2.D).

Each query mirrors one row of the reference's scalar conversion surface
(reference clickhouse_table.go:249-380, SURVEY.md §2.B) over the synthetic
tables, so the DuckDB oracle can check the semantics the ingest path's
transcode library (bristle_spark/transcode.py) implements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bristle_spark.catalog import load_table
from bristle_spark.registry import register


@register(
    "t_project_rename",
    oracle="""
    SELECT l_orderkey   AS order_key,
           l_linenumber AS line_no,
           l_extendedprice AS price,
           l_returnflag AS flag
    FROM lineitem
    """,
)
def t_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12/D6: positional projection + column rename (the reference's
    bristle_column option, clickhouse_table.go:178-181)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_no"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_returnflag").alias("flag"),
    )


@register(
    "t_cast_int_widths",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey % 128 AS TINYINT)          AS v_i8,
           CAST(l_orderkey % 32768 AS SMALLINT)       AS v_i16,
           CAST(l_orderkey AS INTEGER)                AS v_i32,
           CAST(l_orderkey AS BIGINT)                 AS v_i64,
           CAST(l_partkey % 256 AS SMALLINT)          AS v_u8,
           CAST(l_suppkey % 65536 AS INTEGER)         AS v_u16,
           CAST(l_orderkey % 4294967296 AS BIGINT)    AS v_u32,
           CAST(CAST(l_orderkey AS DECIMAL(20, 0)) AS DOUBLE) AS v_u64
    FROM lineitem
    """,
)
def t_cast_int_widths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/S7: signed casts to Int8..64; unsigned widths take the
    next-wider signed type, UInt64 takes DECIMAL(20,0)
    (reference clickhouse_table.go:298-370)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_orderkey") % 128).cast("tinyint").alias("v_i8"),
        (F.col("l_orderkey") % 32768).cast("smallint").alias("v_i16"),
        F.col("l_orderkey").cast("int").alias("v_i32"),
        F.col("l_orderkey").cast("bigint").alias("v_i64"),
        (F.col("l_partkey") % 256).cast("smallint").alias("v_u8"),
        (F.col("l_suppkey") % 65536).cast("int").alias("v_u16"),
        (F.col("l_orderkey") % 4294967296).cast("bigint").alias("v_u32"),
        # DECIMAL(20,0) is the UInt64 fidelity type (transcode.py S7); the
        # declared query surfaces it as DOUBLE because neither engine's
        # pandas bridge carries DECIMAL losslessly for the hash compare.
        F.col("l_orderkey").cast("decimal(20,0)").cast("double").alias("v_u64"),
    )


@register(
    "t_bool_to_int",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_discount > 0.05 AS INTEGER)  AS disc_flag,
           CAST(l_quantity >= 25.0 AS INTEGER) AS bulk_flag
    FROM lineitem
    """,
)
def t_bool_to_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: bool -> UInt8 (true=1, false=0; reference clickhouse_table.go:308-314)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_discount") > 0.05).cast("int").alias("disc_flag"),
        (F.col("l_quantity") >= 25.0).cast("int").alias("bulk_flag"),
    )


@register(
    "t_enum_codes",
    oracle="""
    SELECT o_orderkey,
           CAST(CASE o_orderstatus WHEN 'F' THEN 1 WHEN 'O' THEN 2 WHEN 'P' THEN 3 ELSE 0 END AS TINYINT) AS status_code,
           CASE CAST(CASE o_orderstatus WHEN 'F' THEN 1 WHEN 'O' THEN 2 WHEN 'P' THEN 3 ELSE 0 END AS TINYINT)
                WHEN 1 THEN 'F' WHEN 2 THEN 'O' WHEN 3 THEN 'P' ELSE '?' END AS status_label
    FROM orders
    """,
)
def t_enum_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: enum label<->code map stored as a sized int (Enum8;
    reference clickhouse_table.go:153-160,295-297)."""
    o = load_table(spark, sf_dir, "orders")
    code = (
        F.when(F.col("o_orderstatus") == "F", 1)
        .when(F.col("o_orderstatus") == "O", 2)
        .when(F.col("o_orderstatus") == "P", 3)
        .otherwise(0)
        .cast("tinyint")
    )
    label = F.when(code == 1, "F").when(code == 2, "O").when(code == 3, "P").otherwise("?")
    return o.select("o_orderkey", code.alias("status_code"), label.alias("status_label"))


@register(
    "t_timestamp_epoch",
    oracle="""
    SELECT event_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_s,
           epoch_ms(date_trunc('millisecond', ts))         AS epoch_ms,
           date_trunc('second', ts)                        AS ts_s,
           make_timestamp(CAST(epoch(date_trunc('second', ts)) AS BIGINT) * 1000000) AS ts_roundtrip
    FROM events
    """,
)
def t_timestamp_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: google.protobuf.Timestamp <-> epoch seconds, always UTC
    (reference clickhouse_table.go:264-267)."""
    ev = load_table(spark, sf_dir, "events")
    epoch_s = F.unix_timestamp("ts")
    return ev.select(
        "event_id",
        epoch_s.alias("epoch_s"),
        F.expr("unix_micros(ts) div 1000").alias("epoch_ms"),
        F.date_trunc("second", F.col("ts")).alias("ts_s"),
        F.timestamp_seconds(epoch_s).alias("ts_roundtrip"),
    )


@register(
    "t_null_default",
    oracle="""
    SELECT event_id,
           coalesce(nullif(event_type, 'error'), 'unknown')            AS etype_d,
           round(coalesce(CASE WHEN value < 50.0 THEN NULL ELSE value END, 0.0), 2) AS value_d,
           coalesce(CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id END, -1) AS user_d
    FROM events
    """,
)
def t_null_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: missing field -> NULL for nullable, proto default otherwise
    (the *intended* semantics of reference clickhouse_table.go:253-261;
    the reference's own implementation dead-codes this — SURVEY.md §8.1)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("unknown")).alias("etype_d"),
        F.round(
            F.coalesce(F.when(F.col("value") < 50.0, None).otherwise(F.col("value")), F.lit(0.0)), 2
        ).alias("value_d"),
        F.coalesce(
            F.when(F.col("user_id") % 7 == 0, None).otherwise(F.col("user_id")), F.lit(-1)
        ).alias("user_d"),
    )


@register(
    "t_json_props_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def t_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D16 analog: JSON-lines field extraction (the reference's
    bristle-forward-json CLI pipes JSON into protos;
    reference cmd/bristle-forward-json/main.go:25-46)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
    )


@register(
    "t_map_to_arrays",
    oracle="""
    SELECT event_id,
           array_to_string(list_sort(json_keys(props)), ',') AS tag_keys,
           array_to_string(list_transform(list_sort(json_keys(props)),
                          k -> CAST(json_extract_string(props, '$.' || k) AS BIGINT)), ',') AS tag_values
    FROM events
    """,
)
def t_map_to_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/S4: map field -> two parallel key/value arrays (ClickHouse
    Nested; reference clickhouse_table.go:183-201,270-289). Keys sorted
    because map iteration order is unspecified in both engines. The
    arrays are serialized to delimited strings for the comparison gate
    (pandas canonicalizers cannot sort/hash raw list cells); the array
    form is the same select minus the array_join."""
    ev = load_table(spark, sf_dir, "events")
    # parse the JSON ONCE and sort the entry structs (unique keys sort the
    # struct array by key): the old map_keys + element_at-per-key lambda
    # re-parsed props for every key lookup — 1.42s vs 0.66s at sf0.1
    m = F.from_json("props", "map<string,bigint>")
    entries = F.sort_array(F.map_entries(m))
    base = ev.select("event_id", entries.alias("e"))
    return base.select(
        "event_id",
        F.array_join(F.transform("e", lambda kv: kv["key"]), ",").alias("tag_keys"),
        F.array_join(
            F.transform("e", lambda kv: kv["value"].cast("string")), ","
        ).alias("tag_values"),
    )


@register(
    "t_decimal_math",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(38, 8))) AS VARCHAR) AS sum_exact,
           CAST(sum(CAST(CAST(l_discount AS VARCHAR) AS DECIMAL(38, 8))) AS VARCHAR)      AS sum_disc_exact,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def t_decimal_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal(38,8) exact aggregation — the binance sink's money type
    (reference examples/binance.sql:6-7). Doubles are routed through
    their shortest decimal string before the DECIMAL cast (both engines
    print doubles shortest-roundtrip, so the decimals are identical),
    then summed exactly; output as strings because neither engine's
    pandas bridge carries DECIMAL losslessly."""
    li = load_table(spark, sf_dir, "lineitem")
    price_dec = F.col("l_extendedprice").cast("string").cast("decimal(38,8)")
    disc_dec = F.col("l_discount").cast("string").cast("decimal(38,8)")
    return li.groupBy("l_returnflag").agg(
        F.sum(price_dec).cast("string").alias("sum_exact"),
        F.sum(disc_dec).cast("string").alias("sum_disc_exact"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "t_null_semantics",
    oracle="""
    WITH e AS (
        SELECT event_id,
               nullif(event_type, 'error') AS etype_n,
               CASE WHEN user_id % 5 = 0 THEN NULL ELSE user_id END AS uid_n
        FROM events
    )
    SELECT count(*)          AS n_rows,
           count(etype_n)    AS n_etype,          -- count(col) skips NULLs
           count(uid_n)      AS n_uid,
           CAST(sum(CASE WHEN etype_n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_etype,
           CAST(sum(CASE WHEN uid_n IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe,
           count(DISTINCT etype_n) AS n_distinct_etype  -- NULL excluded
    FROM e
    """,
)
def t_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling semantics: count(col) vs count(*), null-safe
    equality (<=> / IS NOT DISTINCT FROM), NULL exclusion from
    count(DISTINCT)."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        F.nullif("event_type", F.lit("error")).alias("etype_n"),
        F.when(F.col("user_id") % 5 == 0, None).otherwise(F.col("user_id")).alias("uid_n"),
    )
    return e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("etype_n").alias("n_etype"),
        F.count("uid_n").alias("n_uid"),
        F.sum(F.when(F.col("etype_n").isNull(), 1).otherwise(0)).cast("bigint").alias("n_null_etype"),
        F.sum(F.when(F.col("uid_n").eqNullSafe(F.lit(None)), 1).otherwise(0))
        .cast("bigint")
        .alias("n_nullsafe"),
        F.countDistinct("etype_n").alias("n_distinct_etype"),
    )


@register(
    "t_array_ops",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS emb_len,
           embedding[1]                   AS first_val,
           embedding[64]                  AS last_val,
           embedding[2]                   AS head_2,
           embedding[3]                   AS head_3,
           embedding[4]                   AS head_4
    FROM embeddings
    """,
)
def t_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11: repeated field -> Array column; size / element access / slice
    (reference clickhouse_table.go:375-377). The head-slice is surfaced
    as scalar columns (element 1 doubles as first_val) so the output is
    canonicalizer-safe; the slice expression itself is
    ``F.slice("embedding", 1, 4)``."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("emb_len"),
        F.element_at("embedding", 1).alias("first_val"),
        F.element_at("embedding", 64).alias("last_val"),
        F.element_at("embedding", 2).alias("head_2"),
        F.element_at("embedding", 3).alias("head_3"),
        F.element_at("embedding", 4).alias("head_4"),
    )


# ------------------------------------------------- IPv4 / UUID codecs
# ClickHouse's IPv4 column type is a UInt32 with dotted-quad text I/O
# and UUID is 16 bytes with 8-4-4-4-12 text I/O (public ClickHouse type
# docs; the reference's transcode surface, clickhouse_table.go:249-380,
# maps proto scalars onto ClickHouse column types — these two keys
# extend that surface to the address/identifier types an ingest schema
# routinely carries). The synthetic uint32/bytes come from the event id
# hash so both engines re-derive them independently.
_IPV4_SALT = ":ip"


@register(
    "t_ipv4_codec",
    oracle=f"""
    WITH src AS (
        SELECT event_id,
               {{h}} % 4294967296 AS ip_num
        FROM events
    ),
    txt AS (
        SELECT event_id, ip_num,
               CAST(ip_num // 16777216 AS VARCHAR) || '.' ||
               CAST((ip_num // 65536) % 256 AS VARCHAR) || '.' ||
               CAST((ip_num // 256) % 256 AS VARCHAR) || '.' ||
               CAST(ip_num % 256 AS VARCHAR) AS ip_str
        FROM src
    )
    SELECT event_id, ip_num, ip_str,
           CAST(CASE WHEN
                    CAST(string_split(ip_str, '.')[1] AS BIGINT) * 16777216
                  + CAST(string_split(ip_str, '.')[2] AS BIGINT) * 65536
                  + CAST(string_split(ip_str, '.')[3] AS BIGINT) * 256
                  + CAST(string_split(ip_str, '.')[4] AS BIGINT) = ip_num
                THEN 1 ELSE 0 END AS INT) AS roundtrip_ok,
           CAST(ip_num // 16777216 AS BIGINT) AS octet_a
    FROM txt
    """.format(h="CAST('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':ip'), 1, 15) AS BIGINT)"),
)
def t_ipv4_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse IPv4 codec semantics: UInt32 <-> dotted-quad text,
    both directions, with a per-row roundtrip witness (parse(format(x))
    == x must hold for every value) and the /8 network octet a
    ClickHouse query would GROUP BY. The uint32 is hash-derived per
    event so the oracle re-derives it independently.

    All math is BIGINT divide/modulo and string concat — exact in both
    engines; scale shape: pure row-local scan expressions, zero
    shuffles."""
    from bristle_spark.functions.hashing import hash60

    ev = load_table(spark, sf_dir, "events")
    ip = (
        hash60(F.concat(F.col("event_id").cast("string"), F.lit(_IPV4_SALT)))
        % F.lit(4294967296)
    ).alias("ip_num")
    src = ev.select("event_id", ip)
    octets = [
        (F.col("ip_num") / F.lit(16777216)).cast("bigint") % 256,
        (F.col("ip_num") / F.lit(65536)).cast("bigint") % 256,
        (F.col("ip_num") / F.lit(256)).cast("bigint") % 256,
        F.col("ip_num") % 256,
    ]
    txt = src.select(
        "event_id",
        "ip_num",
        F.concat_ws(".", *[o.cast("string") for o in octets]).alias("ip_str"),
    )
    parts = F.split(F.col("ip_str"), "\\.")
    parsed = (
        parts.getItem(0).cast("bigint") * 16777216
        + parts.getItem(1).cast("bigint") * 65536
        + parts.getItem(2).cast("bigint") * 256
        + parts.getItem(3).cast("bigint")
    )
    return txt.select(
        "event_id",
        "ip_num",
        "ip_str",
        (parsed == F.col("ip_num")).cast("int").alias("roundtrip_ok"),
        (F.col("ip_num") / F.lit(16777216)).cast("bigint").alias("octet_a"),
    )


@register(
    "t_uuid_format",
    oracle="""
    WITH h AS (
        SELECT event_id, md5(CAST(event_id AS VARCHAR) || ':uuid') AS hx
        FROM events
    )
    SELECT event_id,
           substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-4' ||
           substr(hx, 14, 3) || '-' ||
           substr('89ab', CAST(('0x' || substr(hx, 17, 1)) AS INT) % 4 + 1, 1) ||
           substr(hx, 18, 3) || '-' || substr(hx, 21, 12) AS uuid_str,
           CAST(substr(hx, 13, 1) AS VARCHAR) AS displaced_nibble
    FROM h
    """,
)
def t_uuid_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse UUID text I/O: 16 hash-derived bytes formatted as an
    RFC 4122 version-4 UUID — 8-4-4-4-12 grouping with the version
    nibble forced to 4 and the variant nibble mapped into [89ab] from
    the source nibble's low 2 bits (exactly what a v4 generator does to
    122 random bits). displaced_nibble carries the overwritten source
    nibble so the oracle also witnesses WHERE the version landed.

    Pure substring/concat on the md5 hex both sides; row-local, zero
    shuffles."""
    ev = load_table(spark, sf_dir, "events")
    hx = F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":uuid")))
    variant = F.substring(
        F.lit("89ab"),
        (F.conv(F.substring(hx, 17, 1), 16, 10).cast("int") % 4 + 1),
        1,
    )
    uuid = F.concat(
        F.substring(hx, 1, 8), F.lit("-"),
        F.substring(hx, 9, 4), F.lit("-4"),
        F.substring(hx, 14, 3), F.lit("-"),
        variant,
        F.substring(hx, 18, 3), F.lit("-"),
        F.substring(hx, 21, 12),
    )
    return ev.select(
        "event_id",
        uuid.alias("uuid_str"),
        F.substring(hx, 13, 1).alias("displaced_nibble"),
    )


# ------------------------------------------------------------- IPv6 codec
# ClickHouse's IPv6 column type is 16 raw bytes with RFC 5952 text I/O:
# lowercase minimal-hex groups, and the LONGEST (leftmost on tie) run of
# >= 2 zero groups compressed to '::'.  Complements t_ipv4_codec on the
# reference's address-type transcode surface (clickhouse_table.go:249-380
# maps proto scalars onto ClickHouse column types).  A zero-mask hash
# zeroes each group with p=1/2 so compression, tie-breaking, and the
# all-zero '::' edge are all exercised on real rows.

# Per-group SQL fragments are rendered ONCE in Python (the _BENFORD_CASE
# pattern) so both engines parse identical expressions.
_IP6_GROUPS_SQL = ", ".join(
    f"CASE WHEN (zmask // {2 ** (i - 1)}) % 2 = 1 THEN CAST(0 AS BIGINT)"
    f" ELSE CAST('0x' || substr(hx, {4 * i - 3}, 4) AS BIGINT) END"
    for i in range(1, 9)
)


@register(
    "t_ipv6_codec",
    oracle=f"""
    WITH h AS (
        SELECT event_id,
               md5(CAST(event_id AS VARCHAR) || ':ip6') AS hx,
               CAST('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':ip6z'), 1, 2) AS BIGINT) AS zmask
        FROM events
    ),
    g AS (
        SELECT event_id, [{_IP6_GROUPS_SQL}] AS gs
        FROM h
    ),
    built AS (
        SELECT event_id, gs,
               list_transform(gs, x -> lower(to_hex(x))) AS hxg,
               list_aggregate(list_transform(gs, x -> CASE WHEN x = 0 THEN '0' ELSE '1' END), 'string_agg', '') AS zmap
        FROM g
    ),
    runs AS (
        SELECT event_id, hxg,
               array_to_string(hxg, ':') AS full_txt,
               CASE WHEN position('00000000' IN zmap) > 0 THEN 8
                    WHEN position('0000000' IN zmap) > 0 THEN 7
                    WHEN position('000000' IN zmap) > 0 THEN 6
                    WHEN position('00000' IN zmap) > 0 THEN 5
                    WHEN position('0000' IN zmap) > 0 THEN 4
                    WHEN position('000' IN zmap) > 0 THEN 3
                    WHEN position('00' IN zmap) > 0 THEN 2
                    ELSE 0 END AS l,
               CAST(8 - length(replace(zmap, '0', '')) AS BIGINT) AS zero_groups,
               zmap
        FROM built
    ),
    comp AS (
        SELECT event_id, full_txt, l, zero_groups,
               CASE WHEN l >= 2 THEN position(repeat('0', l) IN zmap) ELSE 0 END AS p,
               hxg
        FROM runs
    ),
    txt AS (
        SELECT event_id, full_txt, l, zero_groups,
               -- DuckDB array_to_string(<empty list>) is NULL, not ''
               CASE WHEN l >= 2 THEN
                   COALESCE(array_to_string(list_slice(hxg, 1, p - 1), ':'), '')
                   || '::' ||
                   COALESCE(array_to_string(list_slice(hxg, p + l, 8), ':'), '')
               ELSE full_txt END AS ip6
        FROM comp
    ),
    parsed AS (
        SELECT event_id, full_txt, l, zero_groups, ip6,
               CASE WHEN len(string_split(ip6, '::')) = 2 THEN
                   array_to_string(
                       list_concat(list_concat(
                           list_filter(string_split(string_split(ip6, '::')[1], ':'), x -> x <> ''),
                           list_transform(generate_series(1,
                               8 - len(list_filter(string_split(string_split(ip6, '::')[1], ':'), x -> x <> ''))
                                 - len(list_filter(string_split(string_split(ip6, '::')[2], ':'), x -> x <> ''))),
                               x -> '0')),
                           list_filter(string_split(string_split(ip6, '::')[2], ':'), x -> x <> '')),
                       ':')
               ELSE ip6 END AS rebuilt
        FROM txt
    )
    SELECT event_id, full_txt AS ip6_full, ip6,
           CAST(l AS BIGINT) AS run_len, zero_groups,
           CAST(CASE WHEN rebuilt = full_txt THEN 1 ELSE 0 END AS INT) AS roundtrip_ok
    FROM parsed
    """,
)
def t_ipv6_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse IPv6 codec semantics: 16 hash-derived bytes formatted
    per RFC 5952 — lowercase minimal-hex groups, longest (leftmost on
    tie) run of >=2 zero groups compressed to '::' — then PARSED BACK
    ('::' re-expanded to the elided zero groups) with a per-row
    roundtrip witness against the uncompressed form, exactly the
    t_ipv4_codec contract at 8x the width.  A second hash zeroes each
    group with p=1/2, so single zeros (never compressed), tied runs
    (leftmost wins), and the all-zero '::' address all occur in data.

    Determinism: groups are exact BIGINT hex parses; the zero-run scan
    is pure string matching on an 8-char '0'/'1' map; both engines
    build and re-parse the text with the same list/split primitives.
    Scale shape: row-local scan expressions only — zero shuffles, zero
    joins, exactly like the rest of the Group T transcode surface.
    """
    ev = load_table(spark, sf_dir, "events")
    hx = F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":ip6")))
    zmask = F.conv(
        F.substring(
            F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":ip6z"))), 1, 2
        ),
        16,
        10,
    ).cast("bigint")
    groups = [
        F.when(
            F.shiftright(F.col("zmask"), i - 1).bitwiseAND(F.lit(1)) == 1,
            F.lit(0).cast("bigint"),
        ).otherwise(F.conv(F.substring(F.col("hx"), 4 * i - 3, 4), 16, 10).cast("bigint"))
        for i in range(1, 9)
    ]
    g = ev.select("event_id", hx.alias("hx"), zmask.alias("zmask")).select(
        "event_id", *[gc.alias(f"g{i}") for i, gc in enumerate(groups, 1)]
    )
    # r16 (guide §4.1 "prefer built-ins"): the transform(...) lambdas
    # ran this projection INTERPRETED (higher-order functions have no
    # codegen), re-evaluating each lambda tree per element; unrolling
    # the 8 per-group expressions keeps the whole chain inside
    # WholeStageCodegen with subexpression elimination. Same values:
    # lower(hex(g_i)) per element, '0'/'1' map per element.
    built = g.select(
        "event_id",
        F.array(*[F.lower(F.hex(F.col(f"g{i}"))) for i in range(1, 9)]).alias(
            "hxg"
        ),
        F.concat(
            *[
                F.when(F.col(f"g{i}") == 0, F.lit("0")).otherwise(F.lit("1"))
                for i in range(1, 9)
            ]
        ).alias("zmap"),
    )
    l_col = (
        F.when(F.instr(F.col("zmap"), "0" * 8) > 0, 8)
        .when(F.instr(F.col("zmap"), "0" * 7) > 0, 7)
        .when(F.instr(F.col("zmap"), "0" * 6) > 0, 6)
        .when(F.instr(F.col("zmap"), "0" * 5) > 0, 5)
        .when(F.instr(F.col("zmap"), "0" * 4) > 0, 4)
        .when(F.instr(F.col("zmap"), "0" * 3) > 0, 3)
        .when(F.instr(F.col("zmap"), "0" * 2) > 0, 2)
        .otherwise(0)
    )
    runs = built.select(
        "event_id",
        "hxg",
        F.array_join("hxg", ":").alias("full_txt"),
        l_col.alias("l"),
        (8 - F.length(F.replace(F.col("zmap"), F.lit("0"), F.lit(""))))
        .cast("bigint")
        .alias("zero_groups"),
        "zmap",
    )
    comp = runs.select(
        "event_id",
        "full_txt",
        "l",
        "zero_groups",
        F.when(
            F.col("l") >= 2, F.expr("instr(zmap, repeat('0', l))")
        )
        .otherwise(0)
        .alias("p"),
        "hxg",
    )
    txt = comp.select(
        "event_id",
        "full_txt",
        "l",
        "zero_groups",
        F.when(
            F.col("l") >= 2,
            F.concat(
                F.array_join(F.expr("slice(hxg, 1, p - 1)"), ":"),
                F.lit("::"),
                F.array_join(F.expr("slice(hxg, p + l, 9 - p - l)"), ":"),
            ),
        )
        .otherwise(F.col("full_txt"))
        .alias("ip6"),
    )
    # r16: the re-parse used filter(...) higher-order lambdas — an
    # interpreted projection re-evaluating split(ip6, '::') once per
    # lambda tree. String-only rewrite, fully codegen'd: the '::' halves
    # never contain empty inner tokens (they are ':'-joined non-empty
    # hex groups by construction), so the filtered-token counts are
    # plain size(split(...)) with an empty-string guard, the elided
    # zeros render as a repeat('0:', k) slice, and concat_ws skips the
    # NULLed-out empty halves exactly as array concat dropped the empty
    # lists. Byte-identical output (oracle re-verified at all 3 SFs).
    parts = F.split(F.col("ip6"), "::")
    halves = txt.select(
        "event_id",
        "full_txt",
        "l",
        "zero_groups",
        "ip6",
        F.size(parts).alias("_np"),
        F.element_at(parts, 1).alias("_lft"),
        F.element_at(parts, 2).alias("_rgt"),
    )
    nl = (
        F.when(F.col("_lft") == "", F.lit(0))
        .otherwise(F.size(F.split(F.col("_lft"), ":")))
    )
    nr = (
        F.when(F.col("_rgt") == "", F.lit(0))
        .otherwise(F.size(F.split(F.col("_rgt"), ":")))
    )
    parsed = halves.select(
        "event_id", "full_txt", "l", "zero_groups", "ip6", "_np",
        "_lft", "_rgt", (F.lit(8) - nl - nr).alias("_k"),
    )
    zeros = F.expr("substring(repeat('0:', _k), 1, 2 * _k - 1)")
    rebuilt = F.when(
        F.col("_np") == 2,
        F.concat_ws(
            ":",
            F.when(F.col("_lft") == "", F.lit(None)).otherwise(F.col("_lft")),
            F.when(F.col("_k") > 0, zeros),
            F.when(F.col("_rgt") == "", F.lit(None)).otherwise(F.col("_rgt")),
        ),
    ).otherwise(F.col("ip6"))
    return parsed.select(
        "event_id",
        F.col("full_txt").alias("ip6_full"),
        "ip6",
        F.col("l").cast("bigint").alias("run_len"),
        "zero_groups",
        (rebuilt == F.col("full_txt")).cast("int").alias("roundtrip_ok"),
    )


# -------------------------------------------------- FixedString / DateTime64
# Completes the ClickHouse column-type transcode family (IPv4, IPv6,
# UUID, Enum, Decimal, Array, Map already covered): FixedString(N)
# pads short values with NUL bytes and REJECTS long ones at write time
# (the S9 bind-time-reject -> quarantine discipline), DateTime64(3)
# carries millisecond precision through text I/O.

FIXED_STRING_N = 6


@register(
    "t_fixed_string_codec",
    oracle=f"""
    SELECT event_id, event_type,
           CAST(length(event_type) AS BIGINT) AS byte_len,
           CAST(CASE WHEN length(event_type) <= {FIXED_STRING_N} THEN 1 ELSE 0 END AS INT) AS fits,
           CASE WHEN length(event_type) <= {FIXED_STRING_N}
                THEN rpad(upper(hex(event_type)), {FIXED_STRING_N} * 2, '0')
                ELSE NULL END AS fixed_hex,
           CASE WHEN length(event_type) <= {FIXED_STRING_N}
                THEN CAST({FIXED_STRING_N} - length(event_type) AS BIGINT)
                ELSE NULL END AS pad_bytes
    FROM events
    """,
)
def t_fixed_string_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse FixedString({FIXED_STRING_N}) write semantics over the
    event_type column: values at most N bytes are stored NUL-padded to
    exactly N (witnessed as the padded buffer's hex — rpad of the hex
    with '00' pairs is byte-identical to NUL-padding the buffer), and
    LONGER values are rejected at write time ('Too large value for
    FixedString(N)') — here surfaced as fits=0 with NULL storage
    columns, the same per-row quarantine discipline the ingest path
    applies to bind-time rejects (S9).  'purchase' (8 bytes) exercises
    the reject branch on real rows.

    Determinism: pure string length / hex / pad expressions, row-local,
    ASCII payloads (hex() is byte-wise so the witness would hold for
    any bytes).  Scale shape: zero shuffles, zero joins — scan
    expressions only.
    """
    ev = load_table(spark, sf_dir, "events")
    blen = F.length("event_type")
    fits = blen <= FIXED_STRING_N
    return ev.select(
        "event_id",
        "event_type",
        blen.cast("bigint").alias("byte_len"),
        fits.cast("int").alias("fits"),
        F.when(fits, F.rpad(F.upper(F.hex(F.col("event_type"))), FIXED_STRING_N * 2, "0"))
        .otherwise(F.lit(None).cast("string"))
        .alias("fixed_hex"),
        F.when(fits, (F.lit(FIXED_STRING_N) - blen).cast("bigint"))
        .otherwise(F.lit(None).cast("bigint"))
        .alias("pad_bytes"),
    )


@register(
    "t_datetime64_codec",
    oracle="""
    SELECT event_id,
           CAST(epoch_us(ts) // 1000 AS BIGINT) AS ms_epoch,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%g') AS dt64_str,
           CAST(CASE WHEN epoch_us(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S.%g'),
                                            '%Y-%m-%d %H:%M:%S.%g')) // 1000
                     = epoch_us(ts) // 1000
                THEN 1 ELSE 0 END AS INT) AS roundtrip_ok,
           CAST((epoch_us(ts) // 1000) % 1000 AS BIGINT) AS ms_frac
    FROM events
    """,
)
def t_datetime64_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse DateTime64(3) text I/O: the microsecond source
    timestamp narrows to millisecond precision (epoch-ms BIGINT, floor
    — exactly ClickHouse's scale-3 storage), renders as
    'YYYY-MM-DD hh:mm:ss.mmm' (zero-padded), and parses back with a
    per-row roundtrip witness at the stored precision.  The temporal
    sibling of t_timestamp_epoch (which covers whole-second
    DateTime); sub-second columns are where naive codecs silently
    truncate or round differently across engines — the witness pins
    floor semantics on both sides.

    Determinism: epoch math is exact BIGINT floor-division; both
    engines format/parse in the session's pinned UTC.  Scale shape:
    row-local scan expressions, zero shuffles.
    """
    ev = load_table(spark, sf_dir, "events")
    txt = F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS")
    ms = F.expr("unix_micros(ts) DIV 1000")
    back = F.expr(
        "unix_micros(to_timestamp(date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSS'),"
        " 'yyyy-MM-dd HH:mm:ss.SSS')) DIV 1000"
    )
    return ev.select(
        "event_id",
        ms.cast("bigint").alias("ms_epoch"),
        txt.alias("dt64_str"),
        (back == ms).cast("int").alias("roundtrip_ok"),
        (ms % 1000).cast("bigint").alias("ms_frac"),
    )


# --------------------------------------------------------- Tuple codec
# ClickHouse's Tuple(...) column type renders as (v1,'s2',v3) text with
# single-quoted, backslash-escaped strings.  Completes the composite
# branch of the type family (Array, Map, Nested-as-arrays, and now
# Tuple); the parse side uses an anchored regex so the grammar the
# codec accepts is explicit.


@register(
    "t_tuple_codec",
    oracle=r"""
    WITH t AS (
        SELECT event_id,
               event_id % 1000 AS i,
               replace(event_type, '''', '\''') AS s,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
        FROM events
    ),
    txt AS (
        SELECT event_id, i, s, vc,
               '(' || CAST(i AS VARCHAR) || ',''' || s || ''',' || CAST(vc AS VARCHAR) || ')' AS tuple_str
        FROM t
    )
    SELECT event_id, tuple_str,
           TRY_CAST(NULLIF(regexp_extract(tuple_str, '^\((\d+),''([^'']*)'',(-?\d+)\)$', 1), '') AS BIGINT) AS i_back,
           regexp_extract(tuple_str, '^\((\d+),''([^'']*)'',(-?\d+)\)$', 2) AS s_back,
           TRY_CAST(NULLIF(regexp_extract(tuple_str, '^\((\d+),''([^'']*)'',(-?\d+)\)$', 3), '') AS BIGINT) AS vc_back,
           CAST(CASE WHEN TRY_CAST(NULLIF(regexp_extract(tuple_str, '^\((\d+),''([^'']*)'',(-?\d+)\)$', 1), '') AS BIGINT) = i
                      AND regexp_extract(tuple_str, '^\((\d+),''([^'']*)'',(-?\d+)\)$', 2) = s
                      AND TRY_CAST(NULLIF(regexp_extract(tuple_str, '^\((\d+),''([^'']*)'',(-?\d+)\)$', 3), '') AS BIGINT) = vc
                THEN 1 ELSE 0 END AS INT) AS roundtrip_ok
    FROM txt
    """,
)
def t_tuple_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse Tuple(UInt16, String, Int64) text I/O: the composite
    value renders as ``(i,'s',vc)`` — single-quoted string with
    backslash-escaped quotes, exactly ClickHouse's Values/text format —
    and parses back through an anchored regex with a per-field
    roundtrip witness.  Completes the composite-type branch of the
    Group T family (Array, Map-as-arrays, and Tuple).

    The escape step is exercised structurally (event_type carries no
    quotes, so the replace is the identity here — the grammar still
    rejects any unescaped quote by construction of the regex's
    [^']* field).  The witness covers all three fields (s_back against
    the escaped form), and the fail branch is NULL-safe on both sides:
    Spark's '' -> NULL cast is mirrored by TRY_CAST(NULLIF(.., ''))
    in the oracle, and roundtrip_ok is CASE-style (NULL condition ->
    0) on both engines.  Pure string/regex row-local expressions,
    zero shuffles.
    """
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "event_id",
        (F.col("event_id") % 1000).alias("i"),
        F.replace(F.col("event_type"), F.lit("'"), F.lit("\\'")).alias("s"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("vc"),
    )
    txt = t.select(
        "event_id",
        "i",
        "s",
        "vc",
        F.concat(
            F.lit("("),
            F.col("i").cast("string"),
            F.lit(",'"),
            F.col("s"),
            F.lit("',"),
            F.col("vc").cast("string"),
            F.lit(")"),
        ).alias("tuple_str"),
    )
    pat = r"^\((\d+),'([^']*)',(-?\d+)\)$"
    i_back = F.regexp_extract("tuple_str", pat, 1).cast("bigint")
    s_back = F.regexp_extract("tuple_str", pat, 2)
    vc_back = F.regexp_extract("tuple_str", pat, 3).cast("bigint")
    return txt.select(
        "event_id",
        "tuple_str",
        i_back.alias("i_back"),
        s_back.alias("s_back"),
        vc_back.alias("vc_back"),
        F.when(
            (i_back == F.col("i")) & (s_back == F.col("s")) & (vc_back == F.col("vc")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("roundtrip_ok"),
    )


# --------------------------------------------------------- Date32 codec


from bristle_spark.functions.hashing import hash60_sql  # noqa: E402

_D32_HASH = hash60_sql("CAST(event_id AS VARCHAR) || ':d32'")


@register(
    "t_date32_codec",
    oracle=f"""
    WITH d AS (
        SELECT event_id,
               CAST(({_D32_HASH} % 51134) - 25567 AS BIGINT) AS days
        FROM events
    )
    SELECT event_id, days,
           strftime(DATE '1970-01-01' + CAST(days AS INT), '%Y-%m-%d') AS date_str,
           CAST(date_diff('day', DATE '1970-01-01',
                          CAST(strftime(DATE '1970-01-01' + CAST(days AS INT), '%Y-%m-%d') AS DATE))
                AS BIGINT) AS days_back,
           CAST(CASE WHEN date_diff('day', DATE '1970-01-01',
                          CAST(strftime(DATE '1970-01-01' + CAST(days AS INT), '%Y-%m-%d') AS DATE)) = days
                THEN 1 ELSE 0 END AS INT) AS roundtrip_ok,
           CAST(CASE WHEN days < 0 THEN 1 ELSE 0 END AS INT) AS pre_epoch
    FROM d
    """,
)
def t_date32_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse Date32 codec semantics: a signed day offset from the
    Unix epoch (here hash-derived in [-25567, 25567) ≈ 1900–2040, so
    the PRE-epoch branch — where Date, a UInt16, cannot go — is
    exercised on ~half the rows), rendered as ISO text and parsed back
    with a per-row roundtrip witness.  Completes the temporal branch
    of the Group T family (DateTime via t_timestamp_epoch, DateTime64
    via t_datetime64_codec, and now the wide signed date).

    Determinism: integer day arithmetic and ISO rendering on both
    sides (date +/- int days is exact in both engines; no timezones
    touch a pure DATE).  Row-local, zero shuffles.
    """
    from bristle_spark.functions.hashing import hash60

    ev = load_table(spark, sf_dir, "events")
    days = (
        hash60(F.concat(F.col("event_id").cast("string"), F.lit(":d32"))) % 51134
        - 25567
    ).cast("bigint")
    d = ev.select("event_id", days.alias("days"))
    date_col = F.date_add(F.lit("1970-01-01").cast("date"), F.col("days").cast("int"))
    date_str = F.date_format(date_col, "yyyy-MM-dd")
    days_back = F.datediff(
        F.to_date(date_str, "yyyy-MM-dd"), F.lit("1970-01-01").cast("date")
    ).cast("bigint")
    return d.select(
        "event_id",
        "days",
        date_str.alias("date_str"),
        days_back.alias("days_back"),
        (days_back == F.col("days")).cast("int").alias("roundtrip_ok"),
        (F.col("days") < 0).cast("int").alias("pre_epoch"),
    )


# ------------------------------------------------- LowCardinality codec
# ClickHouse's LowCardinality(String) wraps a column in a dictionary:
# a dense index per distinct value plus the dictionary itself.  The
# dictionary order here is LEXICOGRAPHIC (deterministic on any engine
# and any partitioning — ClickHouse's own insertion order is load-order
# -dependent, which no distributed recompute can pin).


@register(
    "t_lowcardinality_codec",
    oracle="""
    WITH dvals AS (SELECT DISTINCT event_type AS v FROM events),
    dict AS (
        SELECT a.v, CAST(count(b.v) AS BIGINT) AS id
        FROM dvals a LEFT JOIN dvals b ON b.v < a.v
        GROUP BY a.v
    ),
    sz AS (SELECT CAST(count(*) AS BIGINT) AS dict_size FROM dvals)
    SELECT e.event_id, e.event_type,
           enc.id AS dict_id,
           dec.v AS decoded,
           CAST(CASE WHEN dec.v = e.event_type THEN 1 ELSE 0 END AS INT)
               AS roundtrip_ok,
           sz.dict_size,
           CAST(CASE WHEN sz.dict_size <= 256 THEN 1 ELSE 0 END AS INT)
               AS fits_uint8
    FROM events e
    JOIN dict enc ON enc.v = e.event_type
    JOIN dict dec ON dec.id = enc.id
    CROSS JOIN sz
    """,
)
def t_lowcardinality_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse LowCardinality(String) codec semantics: the column's
    distinct values form a dictionary (lexicographic ids — see module
    note on why not insertion order), every row encodes to its dense
    dict id, decodes back through the dictionary, and a per-row witness
    confirms the roundtrip; dict_size / fits_uint8 report whether the
    index fits ClickHouse's one-byte fast path.

    The dictionary id is computed WITHOUT a global window (a
    partition-less rank would serialize the build at scale): id(v) =
    |{u in dict : u < v}| via a tiny self-join on the distinct frame —
    exact, associative, and identical SQL-side.  Encode and decode are
    broadcast joins against that dictionary.

    Scale shape: one map-side-combined distinct over the corpus (the
    dictionary, |types| rows), a |dict|^2 self-join on that tiny frame,
    then two broadcast joins back to the scan — the corpus never
    shuffles."""
    ev = load_table(spark, sf_dir, "events")
    dvals = ev.select(F.col("event_type").alias("v")).distinct()
    a = dvals.select(F.col("v"))
    b = dvals.select(F.col("v").alias("u"))
    dict_df = (
        a.join(F.broadcast(b), F.col("u") < F.col("v"), "left")
        .groupBy("v")
        .agg(F.count("u").cast("bigint").alias("id"))
    )
    sz = dvals.agg(F.count(F.lit(1)).cast("bigint").alias("dict_size"))
    enc = dict_df.select(F.col("v").alias("enc_v"), F.col("id").alias("dict_id"))
    dec = dict_df.select(F.col("id").alias("dec_id"), F.col("v").alias("decoded"))
    return (
        ev.select("event_id", "event_type")
        .join(F.broadcast(enc), F.col("event_type") == F.col("enc_v"))
        .join(F.broadcast(dec), F.col("dict_id") == F.col("dec_id"))
        .crossJoin(F.broadcast(sz))
        .select(
            "event_id",
            "event_type",
            "dict_id",
            "decoded",
            (F.col("decoded") == F.col("event_type")).cast("int").alias("roundtrip_ok"),
            "dict_size",
            (F.col("dict_size") <= 256).cast("int").alias("fits_uint8"),
        )
    )


# --------------------------------------------------------- Map codec
# ClickHouse's Map(String, UInt64) renders as {'k1':v1,'k2':v2} text.
# Completes the composite text-codec branch (Tuple in t_tuple_codec,
# Array/Map storage in t_array_ops / t_map_to_arrays); keys are
# rendered in sorted order so the text form is deterministic.


@register(
    "t_map_codec",
    oracle=r"""
    WITH m AS (
        SELECT event_id,
               CAST(hour(ts) AS BIGINT) AS h,
               CAST(length(event_type) AS BIGINT) AS t,
               CAST(user_id % 256 AS BIGINT) AS u
        FROM events
    ),
    txt AS (
        SELECT event_id, h, t, u,
               '{''h'':' || CAST(h AS VARCHAR)
               || ',''t'':' || CAST(t AS VARCHAR)
               || ',''u'':' || CAST(u AS VARCHAR) || '}' AS map_str
        FROM m
    )
    SELECT event_id, map_str,
           TRY_CAST(NULLIF(regexp_extract(map_str,
               '^\{''h'':(\d+),''t'':(\d+),''u'':(\d+)\}$', 1), '') AS BIGINT) AS h_back,
           TRY_CAST(NULLIF(regexp_extract(map_str,
               '^\{''h'':(\d+),''t'':(\d+),''u'':(\d+)\}$', 2), '') AS BIGINT) AS t_back,
           TRY_CAST(NULLIF(regexp_extract(map_str,
               '^\{''h'':(\d+),''t'':(\d+),''u'':(\d+)\}$', 3), '') AS BIGINT) AS u_back,
           CAST(CASE WHEN TRY_CAST(NULLIF(regexp_extract(map_str,
                              '^\{''h'':(\d+),''t'':(\d+),''u'':(\d+)\}$', 1), '') AS BIGINT) = h
                      AND TRY_CAST(NULLIF(regexp_extract(map_str,
                              '^\{''h'':(\d+),''t'':(\d+),''u'':(\d+)\}$', 2), '') AS BIGINT) = t
                      AND TRY_CAST(NULLIF(regexp_extract(map_str,
                              '^\{''h'':(\d+),''t'':(\d+),''u'':(\d+)\}$', 3), '') AS BIGINT) = u
                THEN 1 ELSE 0 END AS INT) AS roundtrip_ok
    FROM txt
    """,
)
def t_map_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse Map(String, UInt64) text I/O: a three-entry map
    derived from the row ({'h': hour, 't': len(event_type),
    'u': user_id % 256}) renders as ClickHouse's Values/text form —
    single-quoted keys, sorted key order — and parses back through an
    anchored regex with a per-field roundtrip witness.  Completes the
    composite text-codec branch begun by t_tuple_codec (whose NULL-safe
    fail-branch discipline this inherits: Spark's '' -> NULL cast is
    mirrored by TRY_CAST(NULLIF(.., '')) and roundtrip_ok is
    CASE-style on both engines).

    Pure string/regex row-local expressions, zero shuffles."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.select(
        "event_id",
        F.hour("ts").cast("bigint").alias("h"),
        F.length("event_type").cast("bigint").alias("t"),
        (F.col("user_id") % 256).cast("bigint").alias("u"),
    )
    txt = m.select(
        "event_id",
        "h",
        "t",
        "u",
        F.concat(
            F.lit("{'h':"),
            F.col("h").cast("string"),
            F.lit(",'t':"),
            F.col("t").cast("string"),
            F.lit(",'u':"),
            F.col("u").cast("string"),
            F.lit("}"),
        ).alias("map_str"),
    )
    pat = r"^\{'h':(\d+),'t':(\d+),'u':(\d+)\}$"
    h_back = F.regexp_extract("map_str", pat, 1).cast("bigint")
    t_back = F.regexp_extract("map_str", pat, 2).cast("bigint")
    u_back = F.regexp_extract("map_str", pat, 3).cast("bigint")
    return txt.select(
        "event_id",
        "map_str",
        h_back.alias("h_back"),
        t_back.alias("t_back"),
        u_back.alias("u_back"),
        F.when(
            (h_back == F.col("h")) & (t_back == F.col("t")) & (u_back == F.col("u")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("roundtrip_ok"),
    )


# --------------------------------------------------------- Array codec
# ClickHouse's Array(Int64) renders as [v1,v2,v3] text.  Third member
# of the composite text-codec trio (Tuple, Map, Array) — bracketed,
# unquoted, comma-joined, parsed back through an anchored regex.


@register(
    "t_array_codec",
    oracle=r"""
    WITH a AS (
        SELECT event_id,
               CAST(event_id % 7 AS BIGINT) AS a0,
               CAST(user_id % 5 AS BIGINT) AS a1,
               CAST(length(event_type) AS BIGINT) AS a2
        FROM events
    ),
    txt AS (
        SELECT event_id, a0, a1, a2,
               '[' || CAST(a0 AS VARCHAR) || ',' || CAST(a1 AS VARCHAR)
                   || ',' || CAST(a2 AS VARCHAR) || ']' AS arr_str
        FROM a
    )
    SELECT event_id, arr_str,
           TRY_CAST(NULLIF(regexp_extract(arr_str,
               '^\[(\d+),(\d+),(\d+)\]$', 1), '') AS BIGINT) AS a0_back,
           TRY_CAST(NULLIF(regexp_extract(arr_str,
               '^\[(\d+),(\d+),(\d+)\]$', 2), '') AS BIGINT) AS a1_back,
           TRY_CAST(NULLIF(regexp_extract(arr_str,
               '^\[(\d+),(\d+),(\d+)\]$', 3), '') AS BIGINT) AS a2_back,
           CAST(len(string_split(trim(arr_str, '[]'), ',')) AS BIGINT) AS n_elems,
           CAST(CASE WHEN TRY_CAST(NULLIF(regexp_extract(arr_str,
                              '^\[(\d+),(\d+),(\d+)\]$', 1), '') AS BIGINT) = a0
                      AND TRY_CAST(NULLIF(regexp_extract(arr_str,
                              '^\[(\d+),(\d+),(\d+)\]$', 2), '') AS BIGINT) = a1
                      AND TRY_CAST(NULLIF(regexp_extract(arr_str,
                              '^\[(\d+),(\d+),(\d+)\]$', 3), '') AS BIGINT) = a2
                THEN 1 ELSE 0 END AS INT) AS roundtrip_ok
    FROM txt
    """,
)
def t_array_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse Array(Int64) text I/O: a three-element array derived
    from the row renders as the bracketed Values/text form and parses
    back through an anchored regex with per-element witnesses plus an
    element-count check (split on the comma, brackets trimmed).
    Completes the composite text-codec trio (t_tuple_codec, t_map_codec)
    and inherits their NULL-safe fail-branch discipline.

    Pure string/regex row-local expressions, zero shuffles."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.select(
        "event_id",
        (F.col("event_id") % 7).cast("bigint").alias("a0"),
        (F.col("user_id") % 5).cast("bigint").alias("a1"),
        F.length("event_type").cast("bigint").alias("a2"),
    )
    txt = a.select(
        "event_id",
        "a0",
        "a1",
        "a2",
        F.concat(
            F.lit("["),
            F.col("a0").cast("string"),
            F.lit(","),
            F.col("a1").cast("string"),
            F.lit(","),
            F.col("a2").cast("string"),
            F.lit("]"),
        ).alias("arr_str"),
    )
    pat = r"^\[(\d+),(\d+),(\d+)\]$"
    backs = [F.regexp_extract("arr_str", pat, i).cast("bigint") for i in (1, 2, 3)]
    n_elems = F.size(F.split(F.expr("trim(BOTH '[]' FROM arr_str)"), ",")).cast(
        "bigint"
    )
    return txt.select(
        "event_id",
        "arr_str",
        backs[0].alias("a0_back"),
        backs[1].alias("a1_back"),
        backs[2].alias("a2_back"),
        n_elems.alias("n_elems"),
        F.when(
            (backs[0] == F.col("a0"))
            & (backs[1] == F.col("a1"))
            & (backs[2] == F.col("a2")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("roundtrip_ok"),
    )
