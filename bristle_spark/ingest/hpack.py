"""HPACK header compression (RFC 7541) — pure-Python, dependency-free.

Built so the ingest front door can speak real HTTP/2-gRPC
(`grpc_transport.py`): the reference registers its service on a stock
gRPC server (ingest_service.go:63-65), whose transport compresses every
request/response header block with HPACK. This container has no grpcio
and no h2/hpack wheels (PARITY.md: pip is env-blocked), so the codec is
implemented directly from the public RFC.

Correctness anchors (tests/test_hpack.py):
- The Huffman code (Appendix B) is a CANONICAL complete prefix code:
  codes are fully determined by the per-symbol code lengths (sort
  symbols by (length, symbol), assign consecutive codes, left-shift at
  each length step). ``HUFFMAN_CODE_LENGTHS`` below therefore *is* the
  table; the test suite proves completeness (Kraft sum == 1 exactly)
  and pins the encoding against the RFC's own Appendix C vectors.
- Integer/string primitives, static table, dynamic-table eviction and
  the four literal representations are validated against Appendix
  C.1-C.6 (both Huffman and plain variants, including the two-response
  eviction walk of C.5/C.6).

Decoder hardening (the server feeds it attacker-controlled bytes):
bounded dynamic-table size updates, EOS-in-stream and bad-padding
rejection (RFC 7541 §5.2), and integer-overflow caps.
"""

from __future__ import annotations

# --------------------------------------------------------------- Huffman

# RFC 7541 Appendix B, expressed as the per-symbol code lengths of the
# canonical code (symbol 256 is EOS).  The codes themselves are derived
# below; tests pin Kraft completeness and the Appendix C byte vectors.
_LENGTH_CLASSES: dict[int, tuple[int, ...]] = {
    5: (48, 49, 50, 97, 99, 101, 105, 111, 115, 116),
    6: (32, 37, 45, 46, 47, 51, 52, 53, 54, 55, 56, 57, 61, 65, 95, 98,
        100, 102, 103, 104, 108, 109, 110, 112, 114, 117),
    7: (58, 66, 67, 68, 69, 70, 71, 72, 73, 74, 75, 76, 77, 78, 79, 80,
        81, 82, 83, 84, 85, 86, 87, 89, 106, 107, 113, 118, 119, 120,
        121, 122),
    8: (38, 42, 44, 59, 88, 90),
    10: (33, 34, 40, 41, 63),
    11: (39, 43, 124),
    12: (35, 62),
    13: (0, 36, 64, 91, 93, 126),
    14: (94, 125),
    15: (60, 96, 123),
    19: (92, 195, 208),
    20: (128, 130, 131, 162, 184, 194, 224, 226),
    21: (153, 161, 167, 172, 176, 177, 179, 209, 216, 217, 227, 229, 230),
    22: (129, 132, 133, 134, 136, 146, 154, 156, 160, 163, 164, 169, 170,
         173, 178, 181, 185, 186, 187, 189, 190, 196, 198, 228, 232, 233),
    23: (1, 135, 137, 138, 139, 140, 141, 143, 147, 149, 150, 151, 152,
         155, 157, 158, 165, 166, 168, 174, 175, 180, 182, 183, 188, 191,
         197, 231, 239),
    24: (9, 142, 144, 145, 148, 159, 171, 206, 215, 225, 236, 237),
    25: (199, 207, 234, 235),
    26: (192, 193, 200, 201, 202, 205, 210, 213, 218, 219, 238, 240, 242,
         243, 255),
    27: (203, 204, 211, 212, 214, 221, 222, 223, 241, 244, 245, 246, 247,
         248, 250, 251, 252, 253, 254),
    28: (2, 3, 4, 5, 6, 7, 8, 11, 12, 14, 15, 16, 17, 18, 19, 20, 21, 23,
         24, 25, 26, 27, 28, 29, 30, 31, 127, 220, 249),
    30: (10, 13, 22, 256),
}

HUFFMAN_CODE_LENGTHS: tuple[int, ...] = tuple(
    length
    for _, length in sorted(
        (sym, length)
        for length, syms in _LENGTH_CLASSES.items()
        for sym in syms
    )
)

EOS = 256


def _build_codes() -> dict[int, tuple[int, int]]:
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for sym in sorted(range(257), key=lambda s: (HUFFMAN_CODE_LENGTHS[s], s)):
        length = HUFFMAN_CODE_LENGTHS[sym]
        code <<= length - prev_len
        codes[sym] = (code, length)
        code += 1
        prev_len = length
    return codes


HUFFMAN_CODES: dict[int, tuple[int, int]] = _build_codes()

# Decode tree: flat array of nodes, each [zero_child, one_child]; leaf
# nodes store -(symbol + 1) so symbol 0 is distinguishable.
def _build_decode_tree() -> list[list[int]]:
    tree: list[list[int]] = [[0, 0]]
    for sym, (code, length) in HUFFMAN_CODES.items():
        node = 0
        for i in range(length - 1, 0, -1):
            bit = (code >> i) & 1
            nxt = tree[node][bit]
            if nxt <= 0:
                tree.append([0, 0])
                nxt = len(tree) - 1
                tree[node][bit] = nxt
            node = nxt
        tree[node][code & 1] = -(sym + 1)
    return tree


_DECODE_TREE = _build_decode_tree()


class HpackError(ValueError):
    """Malformed header block (RFC 7541 decoding error)."""


def huffman_encode(data: bytes) -> bytes:
    bits = 0
    nbits = 0
    out = bytearray()
    for b in data:
        code, length = HUFFMAN_CODES[b]
        bits = (bits << length) | code
        nbits += length
        while nbits >= 8:
            nbits -= 8
            out.append((bits >> nbits) & 0xFF)
    if nbits:
        pad = 8 - nbits
        out.append(((bits << pad) | ((1 << pad) - 1)) & 0xFF)
    return bytes(out)


def huffman_decode(data: bytes) -> bytes:
    out = bytearray()
    node = 0
    depth = 0  # bits consumed since the last emitted symbol
    for byte in data:
        for i in range(7, -1, -1):
            bit = (byte >> i) & 1
            nxt = _DECODE_TREE[node][bit]
            depth += 1
            if nxt < 0:
                sym = -nxt - 1
                if sym == EOS:
                    # EOS inside the stream is a decoding error (§5.2)
                    raise HpackError("EOS symbol in huffman stream")
                out.append(sym)
                node = 0
                depth = 0
            elif nxt == 0:
                raise HpackError("invalid huffman code")
            else:
                node = nxt
    if depth > 7:
        raise HpackError("huffman padding longer than 7 bits")
    if depth:
        # Remaining bits must be the MSB-prefix of EOS: all ones.
        # Walking 1-bits from the root stays on the EOS path, so it is
        # sufficient to check we never left it via a 0 bit; the path we
        # took is recorded by `node` — verify all-ones by replaying.
        # (Cheaper: EOS is all 1s, so any 0 bit in the padding would
        # have led to a leaf or a non-EOS branch; detect by checking
        # the node is reachable via 1-bits only.)
        probe = 0
        for _ in range(depth):
            probe = _DECODE_TREE[probe][1]
            if probe < 0:
                raise HpackError("bad huffman padding")
        if probe != node:
            raise HpackError("huffman padding is not EOS prefix")
    return bytes(out)


# ------------------------------------------------------- integer / string

_MAX_INT = 1 << 32  # decoder cap; header values never approach this


def encode_integer(value: int, prefix_bits: int, flags: int = 0) -> bytes:
    """RFC 7541 §5.1: integer with an N-bit prefix; ``flags`` holds the
    representation bits above the prefix (e.g. 0x80 for indexed)."""
    if value < 0:
        raise ValueError("negative hpack integer")
    limit = (1 << prefix_bits) - 1
    if value < limit:
        return bytes([flags | value])
    out = bytearray([flags | limit])
    value -= limit
    while value >= 0x80:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    out.append(value)
    return bytes(out)


def decode_integer(data: bytes, pos: int, prefix_bits: int) -> tuple[int, int]:
    if pos >= len(data):
        raise HpackError("truncated integer")
    limit = (1 << prefix_bits) - 1
    value = data[pos] & limit
    pos += 1
    if value < limit:
        return value, pos
    shift = 0
    while True:
        if pos >= len(data):
            raise HpackError("truncated integer continuation")
        b = data[pos]
        pos += 1
        value += (b & 0x7F) << shift
        if value >= _MAX_INT:
            raise HpackError("hpack integer too large")
        if not (b & 0x80):
            return value, pos
        shift += 7


def encode_string(data: bytes, huffman: bool = True) -> bytes:
    if huffman:
        enc = huffman_encode(data)
        if len(enc) < len(data):
            return encode_integer(len(enc), 7, 0x80) + enc
    return encode_integer(len(data), 7, 0x00) + data


def decode_string(data: bytes, pos: int) -> tuple[bytes, int]:
    if pos >= len(data):
        raise HpackError("truncated string")
    is_huffman = bool(data[pos] & 0x80)
    length, pos = decode_integer(data, pos, 7)
    end = pos + length
    if end > len(data):
        raise HpackError("truncated string body")
    raw = data[pos:end]
    return (huffman_decode(raw) if is_huffman else raw), end


# ----------------------------------------------------------- header tables

# RFC 7541 Appendix A.
STATIC_TABLE: tuple[tuple[bytes, bytes], ...] = (
    (b":authority", b""),
    (b":method", b"GET"),
    (b":method", b"POST"),
    (b":path", b"/"),
    (b":path", b"/index.html"),
    (b":scheme", b"http"),
    (b":scheme", b"https"),
    (b":status", b"200"),
    (b":status", b"204"),
    (b":status", b"206"),
    (b":status", b"304"),
    (b":status", b"400"),
    (b":status", b"404"),
    (b":status", b"500"),
    (b"accept-charset", b""),
    (b"accept-encoding", b"gzip, deflate"),
    (b"accept-language", b""),
    (b"accept-ranges", b""),
    (b"accept", b""),
    (b"access-control-allow-origin", b""),
    (b"age", b""),
    (b"allow", b""),
    (b"authorization", b""),
    (b"cache-control", b""),
    (b"content-disposition", b""),
    (b"content-encoding", b""),
    (b"content-language", b""),
    (b"content-length", b""),
    (b"content-location", b""),
    (b"content-range", b""),
    (b"content-type", b""),
    (b"cookie", b""),
    (b"date", b""),
    (b"etag", b""),
    (b"expect", b""),
    (b"expires", b""),
    (b"from", b""),
    (b"host", b""),
    (b"if-match", b""),
    (b"if-modified-since", b""),
    (b"if-none-match", b""),
    (b"if-range", b""),
    (b"if-unmodified-since", b""),
    (b"last-modified", b""),
    (b"link", b""),
    (b"location", b""),
    (b"max-forwards", b""),
    (b"proxy-authenticate", b""),
    (b"proxy-authorization", b""),
    (b"range", b""),
    (b"referer", b""),
    (b"refresh", b""),
    (b"retry-after", b""),
    (b"server", b""),
    (b"set-cookie", b""),
    (b"strict-transport-security", b""),
    (b"transfer-encoding", b""),
    (b"user-agent", b""),
    (b"vary", b""),
    (b"via", b""),
    (b"www-authenticate", b""),
)

_STATIC_LEN = len(STATIC_TABLE)  # 61


def _entry_size(name: bytes, value: bytes) -> int:
    return len(name) + len(value) + 32  # §4.1


class _DynamicTable:
    def __init__(self, max_size: int) -> None:
        self.max_size = max_size
        self.entries: list[tuple[bytes, bytes]] = []  # newest first
        self.size = 0

    def add(self, name: bytes, value: bytes) -> None:
        need = _entry_size(name, value)
        self._evict_to(self.max_size - need)
        if need <= self.max_size:
            self.entries.insert(0, (name, value))
            self.size += need
        # else: entry larger than the table empties it (§4.4) — the
        # eviction above already did that.

    def resize(self, new_max: int) -> None:
        self.max_size = new_max
        self._evict_to(new_max)

    def _evict_to(self, budget: int) -> None:
        while self.entries and self.size > max(budget, 0):
            name, value = self.entries.pop()
            self.size -= _entry_size(name, value)


class Decoder:
    """Stateful HPACK decoder — one per connection direction."""

    def __init__(self, max_table_size: int = 4096) -> None:
        self._table = _DynamicTable(max_table_size)
        self._settings_cap = max_table_size

    def set_max_table_size(self, cap: int) -> None:
        """Out-of-band cap from SETTINGS_HEADER_TABLE_SIZE."""
        self._settings_cap = cap
        if self._table.max_size > cap:
            self._table.resize(cap)

    def _lookup(self, index: int) -> tuple[bytes, bytes]:
        if index <= 0:
            raise HpackError("hpack index 0")
        if index <= _STATIC_LEN:
            return STATIC_TABLE[index - 1]
        dyn = index - _STATIC_LEN - 1
        if dyn >= len(self._table.entries):
            raise HpackError(f"hpack index {index} out of range")
        return self._table.entries[dyn]

    def decode(self, data: bytes) -> list[tuple[bytes, bytes]]:
        headers: list[tuple[bytes, bytes]] = []
        pos = 0
        while pos < len(data):
            b = data[pos]
            if b & 0x80 == 0 and b & 0x40 == 0 and b & 0x20:
                # dynamic table size update (§6.3) — §4.2 requires it at
                # the *beginning* of the block; honoring a late one from
                # a malformed peer would desync table state
                if headers:
                    raise HpackError("table size update after header fields")
            if b & 0x80:  # indexed (§6.1)
                index, pos = decode_integer(data, pos, 7)
                headers.append(self._lookup(index))
            elif b & 0x40:  # literal, incremental indexing (§6.2.1)
                index, pos = decode_integer(data, pos, 6)
                name = self._lookup(index)[0] if index else None
                if name is None:
                    name, pos = decode_string(data, pos)
                value, pos = decode_string(data, pos)
                self._table.add(name, value)
                headers.append((name, value))
            elif b & 0x20:  # dynamic table size update (§6.3)
                new_max, pos = decode_integer(data, pos, 5)
                if new_max > self._settings_cap:
                    raise HpackError("table size update above SETTINGS cap")
                self._table.resize(new_max)
            else:  # literal without / never indexing (§6.2.2, §6.2.3)
                index, pos = decode_integer(data, pos, 4)
                name = self._lookup(index)[0] if index else None
                if name is None:
                    name, pos = decode_string(data, pos)
                value, pos = decode_string(data, pos)
                headers.append((name, value))
        return headers


class Encoder:
    """Stateful HPACK encoder. Indexed representation for exact matches,
    incremental-indexing literals otherwise — the strategy every stock
    client implements, so the server-side decoder sees realistic
    dynamic-table churn in loopback tests."""

    def __init__(self, max_table_size: int = 4096, huffman: bool = True) -> None:
        self._table = _DynamicTable(max_table_size)
        self.huffman = huffman
        self._pending_resize: int | None = None

    def set_max_table_size(self, cap: int) -> None:
        """Peer lowered SETTINGS_HEADER_TABLE_SIZE: shrink and schedule
        the mandatory dynamic-table-size-update prefix (§4.2) for the
        next header block."""
        if cap != self._table.max_size:
            self._table.resize(cap)
            self._pending_resize = cap

    def encode(self, headers: list[tuple[bytes, bytes]]) -> bytes:
        out = bytearray()
        if self._pending_resize is not None:
            out += encode_integer(self._pending_resize, 5, 0x20)
            self._pending_resize = None
        for name, value in headers:
            out += self._encode_one(bytes(name), bytes(value))
        return bytes(out)

    def _find(self, name: bytes, value: bytes) -> tuple[int | None, int | None]:
        """(exact_index, name_only_index), 1-based over static+dynamic."""
        name_idx: int | None = None
        for i, (n, v) in enumerate(STATIC_TABLE, start=1):
            if n == name:
                if v == value:
                    return i, None
                if name_idx is None:
                    name_idx = i
        for i, (n, v) in enumerate(self._table.entries, start=_STATIC_LEN + 1):
            if n == name:
                if v == value:
                    return i, None
                if name_idx is None:
                    name_idx = i
        return None, name_idx

    def _encode_one(self, name: bytes, value: bytes) -> bytes:
        exact, name_idx = self._find(name, value)
        if exact is not None:
            return encode_integer(exact, 7, 0x80)
        self._table.add(name, value)
        if name_idx is not None:
            return encode_integer(name_idx, 6, 0x40) + encode_string(
                value, self.huffman
            )
        return (
            bytes([0x40])
            + encode_string(name, self.huffman)
            + encode_string(value, self.huffman)
        )
