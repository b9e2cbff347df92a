"""Drive the CLI as a user would (subprocess — the real surface)."""

from __future__ import annotations

import json
import subprocess
import sys

REPO = "/root/repo"
CONFIG = f"{REPO}/examples/config.json"


def _run(*args: str, timeout: int = 300) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "bristle_spark", *args],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_list_queries():
    r = _run("list-queries", timeout=120)
    assert r.returncode == 0, r.stderr
    out = r.stdout
    assert "r_hash_agg" in out and "l_dedup_minhash" in out and "s_proto_roundtrip" in out
    assert out.count("\n") >= 60


def test_forward_json_end_to_end(tmp_path, spark):
    lines = [
        json.dumps(
            {"s": f"SYM{i}", "p": 1.5 + i, "t": 1_700_000_000_000 + i, "v": 10.0, "c": ["1"]}
        )
        for i in range(25)
    ]
    src = tmp_path / "trades.jsonl"
    src.write_text("\n".join(lines))
    sink = tmp_path / "sink"
    r = _run(
        "forward-json",
        "--config", CONFIG,
        "--type", "bristle.examples.finnhub.FinnhubTrade",
        "--input", str(src),
        "--sink", str(sink),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    back = spark.read.parquet(str(sink))
    assert back.count() == 25
    assert back.columns == ["symbol", "price", "trade_time", "volume", "trade_conditions"]


def test_cli_unknown_query():
    r = _run("query", "--name", "nope_not_real", timeout=200)
    assert r.returncode == 2
    assert "unknown query" in r.stderr


def test_query_docs_fresh():
    """QUERIES.md must be regenerated whenever the registry changes."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "scripts/gen_query_docs.py", "--check"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stdout + r.stderr


def test_serve_pumps_payloads(tmp_path, spark):
    """CLI serve: autobind config + payload files -> pumped to sink."""
    import os

    from pyspark.sql import types as T

    from bristle_spark.ingest.fixtures import encode_example_row, example_binding
    from tests.test_server_reload import _explicit_config

    cfg = tmp_path / "config.json"
    cfg.write_text(json.dumps(_explicit_config()))
    data_root = tmp_path / "data"
    payload_dir = data_root / "payloads" / "default__example_table"

    b = example_binding()
    rows = [
        (b.message_name, bytearray(encode_example_row(name=f"d{i}", value=i)))
        for i in range(5)
    ]
    spark.createDataFrame(
        rows,
        schema=T.StructType(
            [T.StructField("type", T.StringType()), T.StructField("body", T.BinaryType())]
        ),
    ).coalesce(1).write.mode("overwrite").parquet(str(payload_dir))

    r = _run(
        "serve", "--config", str(cfg), "--data-root", str(data_root), "--pumps", "1"
    )
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["batches"]["default.example_table"] >= 1
    sink = data_root / "sink" / "default__example_table"
    assert os.path.isdir(sink)
    assert spark.read.parquet(str(sink)).count() == 5
