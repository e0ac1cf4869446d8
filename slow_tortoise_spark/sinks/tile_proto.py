"""Tile protobuf serialization (reference op G8).

A dependency-free proto3 wire-format encoder (per the public protobuf
encoding spec, https://protobuf.dev/programming-guides/encoding/) for the
tile message family the reference emits (schema recovered from the
generated descriptor in /root/reference/flows/tiles_pb2.py):

    message TileStats {                       // all doubles except count
      uint64 count = 1;   double sum = 2;     double avg = 3;
      double s_sum_t_sum = 4;  double s_sum_t_mean = 5;  double weight = 6;
    }
    message TileBins  { map<uint32, TileStats> stats = 1; uint32 totalBins = 2; }
    message TileCoord { uint32 x = 1; uint32 y = 2; uint32 z = 3; int64 t = 4; }
    message Tile      { TileCoord coord = 1; TileBins bins = 2; }

proto3 rules honored: zero-valued scalars are omitted; map entries are
nested (key=1, value=2) length-delimited messages.
"""

from __future__ import annotations

import struct


def _varint(value: int) -> bytes:
    out = bytearray()
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def _tag(field: int, wire_type: int) -> bytes:
    return _varint((field << 3) | wire_type)


def _field_varint(field: int, value: int) -> bytes:
    return b"" if value == 0 else _tag(field, 0) + _varint(value)


def _field_double(field: int, value: float) -> bytes:
    return b"" if value == 0.0 else _tag(field, 1) + struct.pack("<d", value)


def _field_message(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def encode_tile_stats(
    s_sum_t_sum: float, s_sum_t_mean: float, weight: float
) -> bytes:
    return (
        _field_double(4, s_sum_t_sum)
        + _field_double(5, s_sum_t_mean)
        + _field_double(6, weight)
    )


def encode_tile(
    z: int,
    x: int,
    y: int,
    total_bins: int,
    bins: dict[int, tuple[float, float, float]],
) -> bytes:
    """Serialize one tile. ``bins`` maps bin index → (s_sum_t_sum,
    s_sum_t_mean, weight)."""
    coord = _field_varint(1, x) + _field_varint(2, y) + _field_varint(3, z)
    stats = b""
    for bin_index in sorted(bins):
        entry = _field_varint(1, bin_index) + _field_message(
            2, encode_tile_stats(*bins[bin_index])
        )
        stats += _field_message(1, entry)
    tile_bins = stats + _field_varint(2, total_bins)
    return _field_message(1, coord) + _field_message(2, tile_bins)


# ---------------------------------------------------------------------------
# Decoder (for tests and debugging; full proto3 not needed — just ours)
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _decode_message(buf: bytes) -> dict[int, list]:
    fields: dict[int, list] = {}
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 1:
            val = struct.unpack("<d", buf[pos : pos + 8])[0]
            pos += 8
        elif wire == 2:
            size, pos = _read_varint(buf, pos)
            val = buf[pos : pos + size]
            pos += size
        else:  # pragma: no cover - we never emit groups/fixed32
            raise ValueError(f"unsupported wire type {wire}")
        fields.setdefault(field, []).append(val)
    return fields


def decode_tile(buf: bytes) -> dict:
    """Parse a tile back into plain Python (inverse of encode_tile)."""
    top = _decode_message(buf)
    coord = _decode_message(top[1][0]) if 1 in top else {}
    bins_msg = _decode_message(top[2][0]) if 2 in top else {}
    stats = {}
    for entry in bins_msg.get(1, []):
        e = _decode_message(entry)
        key = e.get(1, [0])[0]
        val = _decode_message(e[2][0]) if 2 in e else {}
        stats[key] = (
            val.get(4, [0.0])[0],
            val.get(5, [0.0])[0],
            val.get(6, [0.0])[0],
        )
    return {
        "z": coord.get(3, [0])[0],
        "x": coord.get(1, [0])[0],
        "y": coord.get(2, [0])[0],
        "total_bins": bins_msg.get(2, [0])[0],
        "stats": stats,
    }
