"""CRC-32C (Castagnoli) — the checksum the zarr v3 ``crc32c`` codec
appends to sharding-indexed shard indexes (and the one iSCSI/ext4 use).

Public algorithm: reflected polynomial 0x1EDC6F41 (table form
0x82F63B78); pinned in tests against the test vectors published in
RFC 7143 §13.1 (32 zero bytes -> 0x8A9136AA, etc.).
"""

from __future__ import annotations

_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _TABLE.append(_c)


def crc32c(data: bytes, crc: int = 0) -> int:
    crc = ~crc & 0xFFFFFFFF
    for b in bytes(data):
        crc = (crc >> 8) ^ _TABLE[(crc ^ b) & 0xFF]
    return ~crc & 0xFFFFFFFF
