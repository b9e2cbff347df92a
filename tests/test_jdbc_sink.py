"""D10's live-connection leg, end to end (VERDICT r6 #6).

The reference's sink commits batches through a pooled JDBC-style
connection (reference clickhouse_table_writer.go:115-149: conn → tx →
prepared cached INSERT → commit). No ClickHouse exists in this sandbox,
but the JDBC branch of ``write_sink`` is transport-generic Spark JDBC —
so we exercise the exact same code path against embedded Apache Derby
(shipped in pyspark's jars): write a batch through
``write_sink(clickhouse_url=...)``, read it back over JDBC, and check
row-for-row equality. This flips PARITY D10 from "query-text only" to
"one live INSERT-through-a-connection execution" (transport caveat:
Derby stands in for ClickHouse).
"""

from __future__ import annotations

import os
import tempfile

import pytest

from bristle_spark.ingest.bindings import MessageBinding, SinkColumn
from bristle_spark.ingest.pipeline import write_sink

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(DERBY_DRIVER)
        return True
    except Exception:
        return False


@pytest.fixture()
def derby_url(spark):
    if not _derby_available(spark):
        pytest.skip("embedded Derby driver not on the Spark classpath")
    d = tempfile.mkdtemp(prefix="bristle_derby_")
    yield f"jdbc:derby:{os.path.join(d, 'sinkdb')};create=true"


def _binding() -> MessageBinding:
    return MessageBinding(
        message_name="JdbcEvent",
        fields=[],
        sink_table="jdbc_events",
        sink_columns=[
            SinkColumn("name", 1, "String"),
            SinkColumn("value", 2, "Float64"),
            SinkColumn("n", 3, "Int64"),
        ],
    )


def test_jdbc_branch_commits_and_reads_back(spark, derby_url):
    rows = [("alpha", 1.5, 10), ("beta", -2.25, 20), ("gamma", 0.0, 30)]
    df = spark.createDataFrame(rows, "name string, value double, n bigint")
    write_sink(
        df,
        path="",  # ignored on the JDBC branch
        clickhouse_url=derby_url,
        binding=_binding(),
    )
    back = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "jdbc_events")
        .option("driver", DERBY_DRIVER)
        .load()
    )
    got = sorted((r["name"], float(r["value"]), int(r["n"])) for r in back.collect())
    assert got == sorted(rows)


def test_jdbc_branch_appends_across_batches(spark, derby_url):
    """Two write_sink calls = two committed batches, both durable — the
    reference's per-batch tx/commit loop."""
    b = _binding()
    one = spark.createDataFrame([("x", 1.0, 1)], "name string, value double, n bigint")
    two = spark.createDataFrame([("y", 2.0, 2)], "name string, value double, n bigint")
    write_sink(one, path="", clickhouse_url=derby_url, binding=b)
    write_sink(two, path="", clickhouse_url=derby_url, binding=b)
    back = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "jdbc_events")
        .option("driver", DERBY_DRIVER)
        .load()
    )
    assert back.count() == 2
    assert {r["name"] for r in back.collect()} == {"x", "y"}


def test_jdbc_branch_requires_binding(spark):
    df = spark.createDataFrame([("x", 1.0, 1)], "name string, value double, n bigint")
    with pytest.raises(ValueError, match="binding"):
        write_sink(df, path="", clickhouse_url="jdbc:derby:memory:nope")
