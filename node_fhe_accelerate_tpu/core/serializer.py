"""Binary serialization of keys, ciphertexts and ballots.

Byte-compatible twin of the reference's `KeySerializer`/`BallotSerializer`
(cpp/include/key_serializer.h:28-112, cpp/src/key_serializer.cpp): magic
bytes ("FHES"/"FHEP"/"FHEE"/"FHEB"/"FHEV"), version, key type, key id,
degree, modulus, data size, CRC32/SHA256 checksum, optional ZLIB
compression.  Payloads are little-endian uint64 coefficient streams.

The <10KB/ballot target (key_serializer.h:392) is met for TFHE-style LWE
ballots; RLWE ballots compress with zlib.
"""
from __future__ import annotations

import hashlib
import struct
import zlib
from dataclasses import dataclass
from enum import IntEnum

import numpy as np

__all__ = [
    "Magic", "ChecksumType", "CompressionType", "SerializationHeader",
    "serialize_polynomial", "deserialize_polynomial",
    "serialize_blob", "deserialize_blob", "quick_verify",
    "SerializationError",
]

SERIALIZATION_VERSION = 1


class Magic(IntEnum):
    SECRET_KEY = 0x46484553    # "FHES"
    PUBLIC_KEY = 0x46484550    # "FHEP"
    EVAL_KEY = 0x46484545      # "FHEE"
    BOOTSTRAP_KEY = 0x46484542  # "FHEB"
    BALLOT = 0x46484556        # "FHEV"


class ChecksumType(IntEnum):
    NONE = 0
    CRC32 = 1
    SHA256 = 2


class CompressionType(IntEnum):
    NONE = 0
    ZLIB = 1
    LZ4 = 2  # native block-format codec (native/codec.cpp nfa_lz4_*)


class SerializationError(ValueError):
    pass


_HEADER_FMT = "<IIIQIQIBB7sI"  # matches SerializationHeader field order
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)


@dataclass
class SerializationHeader:
    magic: int
    version: int = SERIALIZATION_VERSION
    key_type: int = 0
    key_id: int = 0
    poly_degree: int = 0
    modulus: int = 0
    data_size: int = 0
    checksum_type: int = ChecksumType.CRC32
    compression: int = CompressionType.NONE
    checksum: int = 0

    def pack(self) -> bytes:
        return struct.pack(
            _HEADER_FMT, self.magic, self.version, self.key_type,
            self.key_id, self.poly_degree, self.modulus, self.data_size,
            int(self.checksum_type), int(self.compression), b"\0" * 7,
            self.checksum)

    @classmethod
    def unpack(cls, raw: bytes) -> "SerializationHeader":
        if len(raw) < _HEADER_SIZE:
            raise SerializationError("truncated header")
        (magic, version, key_type, key_id, degree, modulus, size,
         ck, comp, _res, checksum) = struct.unpack(_HEADER_FMT,
                                                   raw[:_HEADER_SIZE])
        return cls(magic=magic, version=version, key_type=key_type,
                   key_id=key_id, poly_degree=degree, modulus=modulus,
                   data_size=size, checksum_type=ck, compression=comp,
                   checksum=checksum)


def _checksum(data: bytes, kind: int) -> int:
    if kind == ChecksumType.CRC32:
        return zlib.crc32(data) & 0xFFFFFFFF
    if kind == ChecksumType.SHA256:
        # header stores 32 bits; use the leading word like a tag
        return int.from_bytes(hashlib.sha256(data).digest()[:4], "little")
    return 0


def serialize_blob(magic: Magic, payload: bytes, *, key_id=0, key_type=0,
                   poly_degree=0, modulus=0,
                   checksum_type=ChecksumType.CRC32,
                   compression=CompressionType.NONE) -> bytes:
    """Header + (optionally compressed) payload with checksum-of-payload."""
    if compression == CompressionType.ZLIB:
        payload = zlib.compress(payload, 6)
    elif compression == CompressionType.LZ4:
        # key_serializer.h:30-112 offers ZLIB or LZ4; LZ4 payloads carry an
        # 8-byte raw-size prefix (block format has no length field)
        from .. import native
        payload = struct.pack("<Q", len(payload)) + \
            native.lz4_compress(payload)
    hdr = SerializationHeader(
        magic=int(magic), key_type=key_type, key_id=key_id,
        poly_degree=poly_degree, modulus=modulus, data_size=len(payload),
        checksum_type=checksum_type, compression=compression,
        checksum=_checksum(payload, checksum_type))
    return hdr.pack() + payload


def deserialize_blob(raw: bytes, expected_magic: Magic
                     ) -> tuple[SerializationHeader, bytes]:
    hdr = SerializationHeader.unpack(raw)
    if hdr.magic != int(expected_magic):
        raise SerializationError(
            f"invalid magic bytes: {hdr.magic:#x} != {int(expected_magic):#x}")
    if hdr.version != SERIALIZATION_VERSION:
        raise SerializationError(f"unsupported version {hdr.version}")
    payload = raw[_HEADER_SIZE:_HEADER_SIZE + hdr.data_size]
    if len(payload) != hdr.data_size:
        raise SerializationError("truncated payload")
    # checksum_type comes from the UNTRUSTED header: accepting NONE (or any
    # unknown value, for which _checksum returns 0) would let a tampered
    # blob disable its own corruption detection.  Note CRC32/truncated
    # SHA-256 are integrity checks only, not authentication.
    if hdr.checksum_type not in (ChecksumType.CRC32, ChecksumType.SHA256):
        raise SerializationError(
            f"unacceptable checksum type {hdr.checksum_type} "
            "(NONE/unknown rejected on deserialize)")
    if _checksum(payload, hdr.checksum_type) != hdr.checksum:
        raise SerializationError("checksum mismatch")
    if hdr.compression == CompressionType.ZLIB:
        payload = zlib.decompress(payload)
    elif hdr.compression == CompressionType.LZ4:
        from .. import native
        if len(payload) < 8:
            raise SerializationError("truncated LZ4 payload")
        (raw_size,) = struct.unpack("<Q", payload[:8])
        if raw_size > (1 << 40):
            raise SerializationError("implausible LZ4 raw size")
        try:
            payload = native.lz4_decompress(payload[8:], raw_size)
        except ValueError as exc:
            raise SerializationError(str(exc)) from exc
    return hdr, payload


def quick_verify(raw: bytes, expected_magic: Magic | None = None
                 ) -> SerializationHeader:
    """Header-only integrity check — requirement 16.7's partial
    deserialization: validates magic/version/size and the payload checksum
    WITHOUT decompressing or decoding the payload (the checksum covers the
    stored bytes).  Returns the parsed header; raises SerializationError
    on any mismatch.  O(len) memory-speed CRC, no numpy/bit-unpack work."""
    hdr = SerializationHeader.unpack(raw)
    if expected_magic is not None and hdr.magic != int(expected_magic):
        raise SerializationError(
            f"invalid magic bytes: {hdr.magic:#x} != {int(expected_magic):#x}")
    if hdr.version != SERIALIZATION_VERSION:
        raise SerializationError(f"unsupported version {hdr.version}")
    payload = raw[_HEADER_SIZE:_HEADER_SIZE + hdr.data_size]
    if len(payload) != hdr.data_size:
        raise SerializationError("truncated payload")
    if hdr.checksum_type not in (ChecksumType.CRC32, ChecksumType.SHA256):
        raise SerializationError(
            f"unacceptable checksum type {hdr.checksum_type}")
    if _checksum(payload, hdr.checksum_type) != hdr.checksum:
        raise SerializationError("checksum mismatch")
    return hdr


def serialize_polynomial(coeffs: np.ndarray, magic: Magic, *, key_id=0,
                         key_type=0, modulus=0,
                         compression=CompressionType.NONE,
                         checksum_type=ChecksumType.CRC32) -> bytes:
    """When a modulus is given, coefficients are bit-packed to
    ceil(log2 q) bits by the native codec (node_fhe_accelerate_tpu/native)
    — a 41-bit modulus stores 1.56x smaller than raw u64, serving the
    reference's <10KB ballot budget (key_serializer.h:392)."""
    c = np.ascontiguousarray(np.asarray(coeffs, dtype="<u8"))
    if modulus > 1:
        from .. import native

        bits = max(1, (modulus - 1).bit_length())
        payload = native.pack_words(c.reshape(-1), bits)
    else:
        payload = c.tobytes()
    return serialize_blob(magic, payload, key_id=key_id,
                          key_type=key_type, poly_degree=c.shape[-1],
                          modulus=modulus, compression=compression,
                          checksum_type=checksum_type)


def deserialize_polynomial(raw: bytes, expected_magic: Magic
                           ) -> tuple[SerializationHeader, np.ndarray]:
    hdr, payload = deserialize_blob(raw, expected_magic)
    if hdr.modulus > 1:
        from .. import native

        bits = max(1, (hdr.modulus - 1).bit_length())
        n = len(payload) * 8 // bits
        coeffs = native.unpack_words(payload, n, bits)
    else:
        coeffs = np.frombuffer(payload, dtype="<u8")
    if hdr.poly_degree:
        # drop phantom words introduced by bit-padding
        usable = (coeffs.size // hdr.poly_degree) * hdr.poly_degree
        coeffs = coeffs[:usable].reshape(-1, hdr.poly_degree)
        if coeffs.shape[0] == 1:
            coeffs = coeffs[0]
    return hdr, coeffs
