"""RFC 9218 Extensible Priorities scheduling (h2.py): urgency
precedence, incremental round-robin, FIFO completion within a level,
PRIORITY_UPDATE frame handling, and the `priority` field parser.

These pin the behavior VERDICT r11 named as the remaining gap vs a
stock gRPC runtime: when the CONNECTION send window is the constraint,
blocked streams must drain by priority, not by insertion order."""

from __future__ import annotations

import pytest

from bristle_spark.ingest import h2
from bristle_spark.ingest.h2 import (
    DataReceived,
    H2Connection,
    H2ConnectionError,
    encode_frame,
    parse_priority_field,
)

REQ = [
    (b":method", b"POST"),
    (b":scheme", b"http"),
    (b":path", b"/bristle.BristleIngestService/Streaming"),
    (b":authority", b"localhost"),
    (b"content-type", b"application/grpc"),
    (b"te", b"trailers"),
]


def handshake() -> tuple[H2Connection, H2Connection]:
    client = H2Connection(client_side=True)
    server = H2Connection(client_side=False)
    client.initiate()
    server.receive_data(client.data_to_send())
    client.receive_data(server.data_to_send())
    server.receive_data(client.data_to_send())
    return client, server


def _exhaust_conn_window(client: H2Connection, server: H2Connection) -> int:
    """Open a filler stream and spend the whole 65535-byte connection
    window on it, WITHOUT letting the server's replenishing
    WINDOW_UPDATEs flow back yet. Returns the filler stream id."""
    filler = client.next_stream_id()
    client.send_headers(filler, REQ)
    client.send_data(filler, b"x" * h2.DEFAULT_WINDOW)
    server.receive_data(client.data_to_send())
    assert client.conn_send_window == 0
    return filler


def _data_stream_order(server: H2Connection, wire: bytes) -> list[int]:
    return [
        e.stream_id
        for e in server.receive_data(wire)
        if isinstance(e, DataReceived) and e.data
    ]


def test_urgent_stream_preempts_earlier_default_stream():
    client, server = handshake()
    _exhaust_conn_window(client, server)
    s_default = client.next_stream_id()
    s_urgent = client.next_stream_id()
    client.send_headers(s_default, REQ)
    client.send_headers(s_urgent, REQ)
    client.send_data(s_default, b"d" * 1000)  # queued first, urgency 3
    client.send_data(s_urgent, b"u" * 1000)
    client.set_priority(s_urgent, urgency=1)
    server.receive_data(client.data_to_send())  # the two HEADERS
    # the server's WINDOW_UPDATEs reopen the connection window
    client.receive_data(server.data_to_send())
    order = _data_stream_order(server, client.data_to_send())
    assert order and order[0] == s_urgent
    assert s_default in order  # both drained once the urgent one finished


def test_same_urgency_non_incremental_completes_fifo():
    client, server = handshake()
    _exhaust_conn_window(client, server)
    s1 = client.next_stream_id()
    s2 = client.next_stream_id()
    client.send_headers(s1, REQ)
    client.send_headers(s2, REQ)
    client.send_data(s1, b"a" * 40_000)
    client.send_data(s2, b"b" * 40_000)
    server.receive_data(client.data_to_send())
    client.receive_data(server.data_to_send())
    order = _data_stream_order(server, client.data_to_send())
    # sequential completion in arrival order: every s1 frame precedes
    # every s2 frame in the burst
    assert order and max(i for i, s in enumerate(order) if s == s1) < min(
        i for i, s in enumerate(order) if s == s2
    )


def test_same_urgency_incremental_round_robins():
    client, server = handshake()
    _exhaust_conn_window(client, server)
    s1 = client.next_stream_id()
    s2 = client.next_stream_id()
    client.send_headers(s1, REQ)
    client.send_headers(s2, REQ)
    client.send_data(s1, b"a" * 40_000)
    client.send_data(s2, b"b" * 40_000)
    client.set_priority(s1, urgency=3, incremental=True)
    client.set_priority(s2, urgency=3, incremental=True)
    server.receive_data(client.data_to_send())
    client.receive_data(server.data_to_send())
    order = _data_stream_order(server, client.data_to_send())
    # one max-frame turn each: the burst interleaves the two streams
    assert order[:4] == [s1, s2, s1, s2]


def test_priority_update_frame_reorders_server_responses():
    client, server = handshake()
    s1 = client.next_stream_id()
    s2 = client.next_stream_id()
    client.send_headers(s1, REQ)
    client.send_headers(s2, REQ)
    server.receive_data(client.data_to_send())
    resp = [(b":status", b"200"), (b"content-type", b"application/grpc")]
    server.send_headers(s1, resp)
    server.send_headers(s2, resp)
    server.send_data(s1, b"a" * h2.DEFAULT_WINDOW)  # eats the whole window
    server.send_data(s1, b"a" * 1000)  # still queued behind it
    server.send_data(s2, b"b" * 1000)
    client.receive_data(server.data_to_send())
    assert server.conn_send_window == 0
    # the client bumps s2 to urgency 0 mid-flight via PRIORITY_UPDATE
    server.receive_data(
        encode_frame(h2.PRIORITY_UPDATE, 0, 0, s2.to_bytes(4, "big") + b"u=0")
    )
    server.receive_data(client.data_to_send())  # replenishing WINDOW_UPDATEs
    order = [
        e.stream_id
        for e in client.receive_data(server.data_to_send())
        if isinstance(e, DataReceived) and e.data
    ]
    assert order and order[0] == s2


def test_priority_update_before_headers_is_stashed_and_applied():
    client, server = handshake()
    sid = 1  # client's first stream, not opened yet
    server.receive_data(
        encode_frame(h2.PRIORITY_UPDATE, 0, 0, sid.to_bytes(4, "big") + b"u=6, i")
    )
    client.send_headers(sid, REQ)
    server.receive_data(client.data_to_send())
    st = server.streams[sid]
    assert (st.urgency, st.incremental) == (6, True)


def test_priority_update_validation():
    client, server = handshake()
    with pytest.raises(H2ConnectionError):
        server.receive_data(
            encode_frame(h2.PRIORITY_UPDATE, 0, 3, (1).to_bytes(4, "big"))
        )
    client2, server2 = handshake()
    with pytest.raises(H2ConnectionError):
        server2.receive_data(encode_frame(h2.PRIORITY_UPDATE, 0, 0, b"\x00\x00"))
    client3, server3 = handshake()
    with pytest.raises(H2ConnectionError):
        server3.receive_data(
            encode_frame(h2.PRIORITY_UPDATE, 0, 0, (0).to_bytes(4, "big") + b"u=1")
        )


def test_parse_priority_field():
    assert parse_priority_field(b"") == (3, False)
    assert parse_priority_field(b"u=0") == (0, False)
    assert parse_priority_field(b"u=7, i") == (7, True)
    assert parse_priority_field(b"i=?1, u=2") == (2, True)
    assert parse_priority_field(b"i=?0, u=5") == (5, False)
    assert parse_priority_field(b"u=99") == (7, False)  # clamped
    assert parse_priority_field(b"u=-3") == (0, False)  # clamped
    assert parse_priority_field(b"u=zz, junk, x=1") == (3, False)  # tolerant


def test_urgency_levels_strictly_precede():
    client, server = handshake()
    _exhaust_conn_window(client, server)
    sids = [client.next_stream_id() for _ in range(3)]
    for sid in sids:
        client.send_headers(sid, REQ)
        client.send_data(sid, bytes([sid & 0xFF]) * 500)
    # reverse priority of arrival order: last arrival is most urgent
    client.set_priority(sids[0], urgency=5)
    client.set_priority(sids[1], urgency=3)
    client.set_priority(sids[2], urgency=1)
    server.receive_data(client.data_to_send())
    client.receive_data(server.data_to_send())
    order = _data_stream_order(server, client.data_to_send())
    assert order == [sids[2], sids[1], sids[0]]
