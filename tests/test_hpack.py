"""HPACK (RFC 7541) — structural proofs + the RFC's own Appendix C
test vectors, both directions.

The Huffman table is stored as per-symbol code LENGTHS and expanded
canonically; these tests prove that expansion is the RFC table:
completeness (Kraft sum == 1 exactly — a complete prefix code), the
EOS shape (30 bits, all ones), and byte-exact agreement with every
Huffman string vector printed in RFC 7541 Appendix C.
"""

from __future__ import annotations

from fractions import Fraction

import pytest

from bristle_spark.ingest import hpack
from bristle_spark.ingest.hpack import (
    Decoder,
    Encoder,
    HpackError,
    decode_integer,
    encode_integer,
    huffman_decode,
    huffman_encode,
)


# ------------------------------------------------------ table structure


def test_huffman_code_is_complete_prefix_code():
    assert len(hpack.HUFFMAN_CODE_LENGTHS) == 257
    kraft = sum(Fraction(1, 2**l) for l in hpack.HUFFMAN_CODE_LENGTHS)
    assert kraft == 1  # complete: canonical expansion is unambiguous


def test_huffman_codes_are_prefix_free():
    codes = [
        format(code, f"0{length}b")
        for code, length in hpack.HUFFMAN_CODES.values()
    ]
    assert len(set(codes)) == 257
    codes.sort()
    for a, b in zip(codes, codes[1:]):
        assert not b.startswith(a)


def test_eos_is_thirty_ones():
    code, length = hpack.HUFFMAN_CODES[hpack.EOS]
    assert length == 30
    assert code == (1 << 30) - 1


# ------------------------------------ RFC 7541 Appendix C string vectors

HUFFMAN_VECTORS = {
    b"www.example.com": "f1e3c2e5f23a6ba0ab90f4ff",          # C.4.1
    b"no-cache": "a8eb10649cbf",                               # C.4.2
    b"custom-key": "25a849e95ba97d7f",                         # C.4.3
    b"custom-value": "25a849e95bb8e8b4bf",                     # C.4.3
    b"302": "6402",                                            # C.6.1
    b"private": "aec3771a4b",                                  # C.6.1
    b"Mon, 21 Oct 2013 20:13:21 GMT":
        "d07abe941054d444a8200595040b8166e082a62d1bff",        # C.6.1
    b"https://www.example.com":
        "9d29ad171863c78f0b97c8e9ae82ae43d3",                  # C.6.1
    b"Mon, 21 Oct 2013 20:13:22 GMT":
        "d07abe941054d444a8200595040b8166e084a62d1bff",        # C.6.3
    b"gzip": "9bd9ab",                                         # C.6.3
    b"foo=ASDJKHQKBZXOQWEOPIUAXQWEOIU; max-age=3600; version=1":
        "94e7821dd7f2e6c7b335dfdfcd5b3960d5af27087f3672c1ab27"
        "0fb5291f958731606 5c003ed4ee5b1063d5007".replace(" ", ""),  # C.6.3
}


@pytest.mark.parametrize("plain,hexed", sorted(HUFFMAN_VECTORS.items()))
def test_huffman_rfc_vectors_roundtrip(plain, hexed):
    assert huffman_encode(plain).hex() == hexed
    assert huffman_decode(bytes.fromhex(hexed)) == plain


def test_huffman_rejects_eos_in_stream():
    eos_bytes = ((1 << 30) - 1).to_bytes(4, "big")  # EOS + 2 pad bits
    with pytest.raises(HpackError):
        huffman_decode(bytes([0b11111111]) * 5)
    with pytest.raises(HpackError):
        huffman_decode(eos_bytes)


def test_huffman_rejects_bad_padding():
    # 'a' = 00011 (5 bits); pad with zeros instead of ones
    with pytest.raises(HpackError):
        huffman_decode(bytes([0b00011000]))


# ------------------------------------------- C.1 integer representations


def test_integer_vectors():
    assert encode_integer(10, 5) == bytes([0b01010])           # C.1.1
    assert encode_integer(1337, 5) == bytes([0b11111, 0b10011010, 0b00001010])
    assert encode_integer(42, 8) == bytes([42])                # C.1.3
    assert decode_integer(bytes([0b01010]), 0, 5) == (10, 1)
    assert decode_integer(bytes([31, 154, 10]), 0, 5) == (1337, 3)
    assert decode_integer(bytes([42]), 0, 8) == (42, 1)


def test_integer_overflow_rejected():
    with pytest.raises(HpackError):
        decode_integer(bytes([31] + [0xFF] * 10 + [0x7F]), 0, 5)


# ----------------------------------------- C.2 literal header field reps


def test_c21_literal_with_indexing():
    block = bytes.fromhex(
        "400a637573746f6d2d6b65790d637573746f6d2d686561646572"
    )
    d = Decoder()
    assert d.decode(block) == [(b"custom-key", b"custom-header")]
    assert d._table.size == 55


def test_c22_literal_without_indexing():
    block = bytes.fromhex("040c2f73616d706c652f70617468")
    d = Decoder()
    assert d.decode(block) == [(b":path", b"/sample/path")]
    assert d._table.size == 0


def test_c23_literal_never_indexed():
    block = bytes.fromhex("100870617373776f726406736563726574")
    d = Decoder()
    assert d.decode(block) == [(b"password", b"secret")]
    assert d._table.size == 0


def test_c24_indexed_field():
    d = Decoder()
    assert d.decode(bytes.fromhex("82")) == [(b":method", b"GET")]


# -------------------------------------- C.3 request examples (no huffman)

_REQ1 = [
    (b":method", b"GET"),
    (b":scheme", b"http"),
    (b":path", b"/"),
    (b":authority", b"www.example.com"),
]
_REQ2 = _REQ1 + [(b"cache-control", b"no-cache")]
_REQ3 = [
    (b":method", b"GET"),
    (b":scheme", b"https"),
    (b":path", b"/index.html"),
    (b":authority", b"www.example.com"),
    (b"custom-key", b"custom-value"),
]


def test_c3_request_sequence_plain():
    d = Decoder()
    b1 = bytes.fromhex("828684410f7777772e6578616d706c652e636f6d")
    assert d.decode(b1) == _REQ1
    assert d._table.size == 57
    b2 = bytes.fromhex("828684be58086e6f2d6361636865")
    assert d.decode(b2) == _REQ2
    assert d._table.size == 110
    b3 = bytes.fromhex(
        "828785bf400a637573746f6d2d6b65790c637573746f6d2d76616c7565"
    )
    assert d.decode(b3) == _REQ3
    assert d._table.size == 164


def test_c4_request_sequence_huffman():
    d = Decoder()
    b1 = bytes.fromhex("828684418cf1e3c2e5f23a6ba0ab90f4ff")
    assert d.decode(b1) == _REQ1
    b2 = bytes.fromhex("828684be5886a8eb10649cbf")
    assert d.decode(b2) == _REQ2
    b3 = bytes.fromhex("828785bf408825a849e95ba97d7f8925a849e95bb8e8b4bf")
    assert d.decode(b3) == _REQ3
    assert d._table.size == 164


# ------------------- C.5/C.6 response examples (256-byte table, eviction)

_RESP1 = [
    (b":status", b"302"),
    (b"cache-control", b"private"),
    (b"date", b"Mon, 21 Oct 2013 20:13:21 GMT"),
    (b"location", b"https://www.example.com"),
]
_RESP2 = [
    (b":status", b"307"),
    (b"cache-control", b"private"),
    (b"date", b"Mon, 21 Oct 2013 20:13:21 GMT"),
    (b"location", b"https://www.example.com"),
]
_RESP3 = [
    (b":status", b"200"),
    (b"cache-control", b"private"),
    (b"date", b"Mon, 21 Oct 2013 20:13:22 GMT"),
    (b"location", b"https://www.example.com"),
    (b"content-encoding", b"gzip"),
    (b"set-cookie",
     b"foo=ASDJKHQKBZXOQWEOPIUAXQWEOIU; max-age=3600; version=1"),
]


def test_c6_response_sequence_huffman_with_eviction():
    d = Decoder(max_table_size=256)
    b1 = bytes.fromhex(
        "488264025885aec3771a4b6196d07abe941054d444a8200595040b8166"
        "e082a62d1bff6e919d29ad171863c78f0b97c8e9ae82ae43d3"
    )
    assert d.decode(b1) == _RESP1
    assert d._table.size == 222
    b2 = bytes.fromhex("4883640effc1c0bf")
    assert d.decode(b2) == _RESP2
    assert d._table.size == 222  # :status 307 evicted :status 302
    b3 = bytes.fromhex(
        "88c16196d07abe941054d444a8200595040b8166e084a62d1bffc05a83"
        "9bd9ab77ad94e7821dd7f2e6c7b335dfdfcd5b3960d5af27087f3672c1"
        "ab270fb5291f958731606 5c003ed4ee5b1063d5007".replace(" ", "")
    )
    assert d.decode(b3) == _RESP3
    assert d._table.size == 215


# --------------------------------------------------- encoder <-> decoder


def test_encoder_decoder_roundtrip_with_dynamic_table():
    enc, dec = Encoder(), Decoder()
    h1 = [
        (b":method", b"POST"),
        (b":scheme", b"http"),
        (b":path", b"/bristle.BristleIngestService/Streaming"),
        (b":authority", b"localhost:50051"),
        (b"content-type", b"application/grpc"),
        (b"te", b"trailers"),
    ]
    assert dec.decode(enc.encode(h1)) == h1
    # second block: repeated headers must come out of the dynamic table
    block2 = enc.encode(h1)
    assert len(block2) < 12  # all indexed
    assert dec.decode(block2) == h1


def test_encoder_roundtrip_plain_and_huffman():
    for huff in (True, False):
        enc, dec = Encoder(huffman=huff), Decoder()
        hdrs = [(b"x-custom", bytes(range(1, 255)))]
        assert dec.decode(enc.encode(hdrs)) == hdrs


def test_decoder_rejects_table_size_update_above_cap():
    d = Decoder(max_table_size=4096)
    with pytest.raises(HpackError):
        d.decode(encode_integer(8192, 5, 0x20))


def test_decoder_rejects_bad_index():
    d = Decoder()
    with pytest.raises(HpackError):
        d.decode(bytes.fromhex("be"))  # dynamic index on empty table
    with pytest.raises(HpackError):
        d.decode(bytes.fromhex("80"))  # index 0


def test_decoder_rejects_mid_block_table_size_update():
    """§4.2: a dynamic-table-size-update is only legal at the BEGINNING
    of a header block; one arriving after a header field is a
    compression error, not silently honored."""
    d = Decoder(max_table_size=4096)
    # leading update is fine
    block = encode_integer(2048, 5, 0x20) + bytes.fromhex("82")  # :method GET
    assert d.decode(block) == [(b":method", b"GET")]
    # update AFTER a field must raise
    bad = bytes.fromhex("82") + encode_integer(1024, 5, 0x20)
    with pytest.raises(HpackError):
        d.decode(bad)
