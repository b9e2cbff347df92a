"""TLS/ALPN on the HTTP/2-gRPC front door (VERDICT r10 ask #4): a
production bristle client connects over TLS with ALPN ``h2``; stdlib
``ssl`` supports both, so the transport gains a tls_context without any
new dependency. A throwaway self-signed cert is generated per test
session with the openssl CLI."""

from __future__ import annotations

import json
import os
import socket
import ssl
import subprocess

import pytest

from bristle_spark.ingest import grpc_transport as gt
from bristle_spark.ingest import service as svc
from bristle_spark.ingest.fixtures import (
    binance_ddl_columns,
    encode_example_row,
    example_binding,
    example_descriptor_set,
    binance_descriptor_set,
    finnhub_ddl_columns,
    finnhub_descriptor_set,
)
from bristle_spark.ingest.grpc_transport import GrpcIngestClient, GrpcIngestService
from bristle_spark.ingest.server import IngestServer


@pytest.fixture(scope="module")
def certpair(tmp_path_factory):
    d = tmp_path_factory.mktemp("tls")
    cert, key = str(d / "cert.pem"), str(d / "key.pem")
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
            "-keyout", key, "-out", cert, "-days", "1",
            "-subj", "/CN=localhost",
            "-addext", "subjectAltName=DNS:localhost,IP:127.0.0.1",
        ],
        check=True, capture_output=True,
    )
    return cert, key


@pytest.fixture()
def tls_server(spark, tmp_path, certpair):
    cert, key = certpair
    for fname, blob in (
        ("example.pb", example_descriptor_set()),
        ("binance.pb", binance_descriptor_set()),
        ("finnhub.pb", finnhub_descriptor_set()),
    ):
        (tmp_path / fname).write_bytes(blob)
    cols = lambda cs: [  # noqa: E731
        {"name": c.name, "type": c.ch_type, "default": c.default} for c in cs
    ]
    cfg = {
        "autobind": True,
        "proto_descriptor_paths": ["example.pb", "binance.pb", "finnhub.pb"],
        "tables": [
            {
                "name": "default.example_table",
                "columns": cols(example_binding().sink_columns),
                "ts_column": "timestamp",
            },
            {"name": "binance.trade_events", "columns": cols(binance_ddl_columns())},
            {"name": "finnhub.trades", "columns": cols(finnhub_ddl_columns())},
        ],
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    server = IngestServer(spark, str(tmp_path / "config.json"), str(tmp_path / "data"))
    ctx = gt.make_server_tls_context(cert, key)
    return server, ctx, cert


def test_tls_end_to_end_three_fixtures(spark, tls_server):
    """The three-fixture end-to-end over TLS: streaming bidi RPC with a
    CA-verifying client (the production shape), then unary WriteBatch on
    the same TLS listener."""
    from tests.test_socket_service import _binance_body, _finnhub_body

    server, ctx, cert = tls_server
    with GrpcIngestService(server, tls_context=ctx) as service:
        cctx = gt.make_client_tls_context(cafile=cert)
        with GrpcIngestClient(
            "127.0.0.1", service.port,
            tls_context=cctx, server_hostname="localhost",
        ) as client:
            assert client.conn.selected_alpn_protocol() == "h2"
            for type_name, bodies in (
                ("ExampleMessage",
                 [encode_example_row(name=f"t_{i}", type_code=1,
                                     ts=(1_700_000_000, 0), value=i)
                  for i in range(4)]),
                ("Trade", [_binance_body(i) for i in range(3)]),
                ("FinnhubTrade", [_finnhub_body(i) for i in range(2)]),
            ):
                tid = client.register_type(type_name)
                assert client.write_batch(bodies, type_id=tid) == svc.OK
        ack, dropped = gt.grpc_write_batch_unary(
            "127.0.0.1", service.port,
            [("ExampleMessage", [encode_example_row(name="u", value=9)])],
            tls_context=gt.make_client_tls_context(cafile=cert),
            server_hostname="localhost",
        )
        assert (ack, dropped) == (1, 0)
    import pyarrow.parquet as pq

    for table, n in (
        ("default__example_table", 5),  # 4 streaming + 1 unary
        ("binance__trade_events", 3),
        ("finnhub__trades", 2),
    ):
        payload_dir = os.path.join(server.data_root, "payloads", table)
        total = sum(
            pq.read_table(os.path.join(payload_dir, f)).num_rows
            for f in os.listdir(payload_dir)
        )
        assert total == n


def test_tls_rejects_cleartext_client(spark, tls_server):
    """A cleartext h2c client against the TLS listener must fail the
    connection cleanly (no HTTP/2 bytes served), not hang."""
    server, ctx, _cert = tls_server
    with GrpcIngestService(server, tls_context=ctx) as service:
        with pytest.raises((ConnectionError, OSError, TimeoutError, ValueError)):
            # the constructor may buffer its preface without error; the
            # register round-trip REQUIRES a server response, which a
            # TLS listener never gives a cleartext client
            client = GrpcIngestClient("127.0.0.1", service.port, timeout=3)
            client.register_type("ExampleMessage")


def test_tls_requires_alpn_h2(spark, tls_server):
    """A TLS client that does NOT offer ALPN h2 handshakes but gets no
    HTTP/2 service: RFC 7540 §3.3 makes the token mandatory."""
    server, ctx, cert = tls_server
    with GrpcIngestService(server, tls_context=ctx) as service:
        plain = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        plain.check_hostname = False
        plain.verify_mode = ssl.CERT_NONE  # no ALPN offered at all
        raw = socket.create_connection(("127.0.0.1", service.port), timeout=5)
        tls = plain.wrap_socket(raw, server_hostname="localhost")
        try:
            assert tls.selected_alpn_protocol() is None
            tls.sendall(b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n")
            tls.settimeout(5)
            try:
                data = tls.recv(4096)
            except (ssl.SSLError, OSError, TimeoutError):
                data = b""
            assert data == b"", "server served HTTP/2 without ALPN h2"
        finally:
            tls.close()


def test_tls_client_verifies_server_cert(spark, tls_server):
    """A verifying client with the WRONG CA must refuse the server."""
    server, ctx, _cert = tls_server
    with GrpcIngestService(server, tls_context=ctx) as service:
        strict = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)  # system CAs only
        strict.set_alpn_protocols(["h2"])
        with pytest.raises((ConnectionError, ssl.SSLError)):
            gt._tls_connect("127.0.0.1", service.port, 5, strict, "localhost")


def test_cleartext_path_still_works(spark, tls_server):
    """tls_context=None keeps the h2c prior-knowledge path byte-for-byte
    unchanged."""
    server, _ctx, _cert = tls_server
    with GrpcIngestService(server) as service:  # no TLS
        ack, dropped = gt.grpc_write_batch_unary(
            "127.0.0.1", service.port,
            [("ExampleMessage", [encode_example_row(name="c", value=1)])],
        )
        assert (ack, dropped) == (1, 0)
