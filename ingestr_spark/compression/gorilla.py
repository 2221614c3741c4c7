"""Delta-of-delta timestamp + Gorilla XOR value compression (rule-mandated).

Not present in the reference (it has no storage layer beyond CSV caches —
R/ingest_modis_bysite.R:98-103); mandated by BASELINE.json north_rule for
rolled-up points in continuous-aggregate tables. Formats follow the Gorilla
paper (Pelkonen et al., VLDB 2015, "Gorilla: A Fast, Scalable, In-Memory
Time Series Database", §4.1):

* timestamps: header = t0 (64 bit) + first delta (64 bit); then per point a
  delta-of-delta in variable-length buckets
  '0' | '10'+7b | '110'+9b | '1110'+12b | '1111'+64b (zigzag-coded),
* values: v0 raw 64 bit; then XOR with previous:
  '0' if identical; '10' + meaningful bits if they fit the previous
  leading/trailing-zero window; '11' + 6b leading + 6b length + bits.

NaN encodes fine (it's just a bit pattern; NaN XOR NaN == 0). Round-trip is
bit-exact on float64 — asserted by tests incl. a hypothesis property.

Scale design: encoding is inherently sequential per series, so it runs as a
grouped pandas UDF over (key, chunk) — one Arrow batch per chunk, bounded
chunk length keeps executor memory flat (SURVEY §7.3-5). The bit loop is
pure Python over numpy-prepared deltas/XORs; at true 10^12 scale this would
be the one component worth a native (Scala/C) kernel, but the interface
(binary columns per chunk in the aggregate table) would not change.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# Chunk-format version byte, written first in every blob so stored-format
# changes fail loudly instead of decoding garbage. v2 = zigzag-symmetric dod
# bucket ranges (round-2 fix); round-1 blobs were unversioned — their first
# byte is the high byte of the 32-bit count, i.e. 0x00 for any chunk under
# 2^24 points, so they are reliably rejected as "unversioned legacy".
CODEC_VERSION = 2


def _check_version(r: "_BitReader", what: str) -> None:
    v = r.read(8)
    if v != CODEC_VERSION:
        hint = "unversioned round-1 blob (re-encode the tier)" if v == 0 else "unknown"
        raise ValueError(
            f"{what} chunk codec version {v} != {CODEC_VERSION} ({hint})"
        )


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_zeros(self, bits: int) -> None:
        """Append ``bits`` zero bits — byte-aligned bulk fill (one buffer
        extend) instead of per-bit big-int shifting."""
        head = (8 - self.nbits) % 8
        if head:
            head = min(head, bits)
            self.write(0, head)
            bits -= head
        nbytes, rem = divmod(bits, 8)
        if nbytes:
            self.buf.extend(b"\x00" * nbytes)
        if rem:
            self.write(0, rem)

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        """Read ``bits`` as one big-endian slice (one int.from_bytes per
        call, not one loop iteration per bit — the per-bit version made
        DECODE 4x slower than encode)."""
        pos = self.pos
        end = pos + bits
        if end > 8 * len(self.data):
            raise ValueError(
                f"truncated blob: need bit {end}, have {8 * len(self.data)}"
            )
        last = (end + 7) >> 3
        chunk = int.from_bytes(self.data[pos >> 3:last], "big")
        self.pos = end
        return (chunk >> ((last << 3) - end)) & ((1 << bits) - 1)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


# ---- timestamp codec: delta-of-delta ---------------------------------------

def encode_timestamps(ts: np.ndarray) -> bytes:
    """ts: int64 array (epoch seconds or any monotone int axis)."""
    ts = np.asarray(ts, dtype=np.int64)
    n = len(ts)
    w = _BitWriter()
    w.write(CODEC_VERSION, 8)
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    if n == 1:
        return w.getvalue()
    deltas = np.diff(ts)
    w.write(int(deltas[0]) & ((1 << 64) - 1), 64)
    dods = np.diff(deltas)
    # Regular cadence dominates real series: every dod==0 is a single '0'
    # bit, so a run of z zeros is ONE write(0, z) call — identical
    # bitstream, O(nonzero dods) Python work instead of O(points).
    nz = np.flatnonzero(dods)
    prev_end = 0
    for i in nz.tolist():
        if i > prev_end:
            w.write_zeros(i - prev_end)
        prev_end = i + 1
        dod = int(dods[i])
        # zigzag-symmetric ranges: zigzag(dod) must fit the field width
        # (zigzag(63)=126, zigzag(-64)=127 fit 7 bits; zigzag(64)=128 does
        # not — the paper's asymmetric ranges assume offset, not zigzag).
        # Control prefix and payload are fused into ONE write call each
        # (identical bitstream, half the Python call count).
        if -64 <= dod <= 63:
            w.write((0b10 << 7) | _zigzag(dod), 9)
        elif -256 <= dod <= 255:
            w.write((0b110 << 9) | _zigzag(dod), 12)
        elif -2048 <= dod <= 2047:
            w.write((0b1110 << 12) | _zigzag(dod), 16)
        else:
            w.write((0b1111 << 64) | _zigzag(dod), 68)
    if len(dods) > prev_end:
        w.write_zeros(len(dods) - prev_end)
    return w.getvalue()


def decode_timestamps(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    _check_version(r, "timestamp")
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    t0 = r.read(64)
    out[0] = t0 - (1 << 64) if t0 >= (1 << 63) else t0
    if n == 1:
        return out
    d = r.read(64)
    delta = d - (1 << 64) if d >= (1 << 63) else d
    out[1] = out[0] + delta
    i = 2
    while i < n:
        # fast path mirroring the encoder's zero-run bulk writes: at a
        # control-bit position, a 0x00 byte is exactly eight '0' controls
        # (eight dod=0 points) — consume them without per-bit reads
        if (
            r.pos & 7 == 0
            and i + 8 <= n
            and r.data[r.pos >> 3] == 0
        ):
            for _ in range(8):
                out[i] = out[i - 1] + delta
                i += 1
            r.pos += 8
            continue
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = _unzigzag(r.read(7))
        elif r.read(1) == 0:
            dod = _unzigzag(r.read(9))
        elif r.read(1) == 0:
            dod = _unzigzag(r.read(12))
        else:
            dod = _unzigzag(r.read(64))
        delta += dod
        out[i] = out[i - 1] + delta
        i += 1
    return out


# ---- value codec: Gorilla XOR ----------------------------------------------

def encode_values(vals: np.ndarray) -> bytes:
    """vals: float64 array; bit-exact round trip (NaN included)."""
    bits = np.asarray(vals, dtype=np.float64).view(np.uint64)
    n = len(bits)
    w = _BitWriter()
    w.write(CODEC_VERSION, 8)
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    w.write(int(bits[0]), 64)
    prev = int(bits[0])
    prev_lead, prev_len = 65, 0  # 65 = "no previous window"
    xors = np.bitwise_xor(bits[1:], bits[:-1]) if n > 1 else np.empty(0, np.uint64)
    # constant stretches (XOR == 0) are single '0' bits: emit runs in bulk
    nz = np.flatnonzero(xors)
    prev_end = 0
    for i in nz.tolist():
        if i > prev_end:
            w.write_zeros(i - prev_end)
        prev_end = i + 1
        x = int(xors[i])
        lead = 64 - x.bit_length()
        trail = (x & -x).bit_length() - 1
        if lead > 31:  # 5-bit leading field cap (paper format)
            lead = 31
        # control + fields + payload fused into one write per point
        # (identical bitstream, ~3x fewer Python calls)
        if prev_lead <= 64 and lead >= prev_lead and trail >= (64 - prev_lead - prev_len):
            w.write((0b10 << prev_len) | (x >> (64 - prev_lead - prev_len)),
                    2 + prev_len)
        else:
            mlen = 64 - lead - trail
            # 64 encodes as 0 in the 6-bit length field (paper trick)
            w.write(
                (((((0b11 << 5) | lead) << 6) | (mlen & 0x3F)) << mlen)
                | (x >> trail),
                13 + mlen,
            )
            prev_lead, prev_len = lead, mlen
    if len(xors) > prev_end:
        w.write_zeros(len(xors) - prev_end)
    return w.getvalue()


def decode_values(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    _check_version(r, "value")
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    cur = r.read(64)
    out[0] = cur
    lead, mlen = 0, 0
    i = 1
    while i < n:
        # zero-byte fast path: eight '0' controls = eight repeated values
        if r.pos & 7 == 0 and i + 8 <= n and r.data[r.pos >> 3] == 0:
            out[i:i + 8] = cur
            i += 8
            r.pos += 8
            continue
        if r.read(1) == 0:
            out[i] = cur
            i += 1
            continue
        if r.read(1) == 1:
            lead = r.read(5)
            mlen = r.read(6)
            if mlen == 0:
                mlen = 64
        trail = 64 - lead - mlen
        x = r.read(mlen) << trail
        cur ^= x
        out[i] = cur
        i += 1
    return out.view(np.float64)


# ---- DataFrame-level API -----------------------------------------------------

COMPRESSED_SCHEMA_SUFFIX = [
    T.StructField("n_points", T.IntegerType()),
    T.StructField("ts_dod", T.BinaryType()),
    T.StructField("vals_gorilla", T.BinaryType()),
]


def compress_tier(
    df: DataFrame,
    value_col: str,
    key_cols: list[str] | None = None,
    bucket_col: str = "bucket",
    chunk_expr: str = "year(bucket)",
) -> DataFrame:
    """Pack each (key, chunk) series into one row of binary columns.

    ``chunk_expr`` bounds series length per pandas-UDF group (a year of
    hourly points = 8784 — far under Arrow batch limits even for the hot
    source). Output: key_cols + chunk + n_points + ts_dod + vals_gorilla.
    """
    key_cols = key_cols or ["source"]
    work = df.select(
        *key_cols,
        F.expr(chunk_expr).alias("chunk"),
        F.col(bucket_col).cast("timestamp").cast("long").alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
    )
    out_schema = T.StructType(
        [work.schema[c] for c in key_cols]
        + [work.schema["chunk"], *COMPRESSED_SCHEMA_SUFFIX]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_t")
        ts = pdf["_t"].to_numpy(dtype="int64")
        vs = pdf["_v"].to_numpy(dtype="float64")
        head = {c: [pdf[c].iloc[0]] for c in key_cols}
        head["chunk"] = [pdf["chunk"].iloc[0]]
        head["n_points"] = [len(ts)]
        head["ts_dod"] = [encode_timestamps(ts)]
        head["vals_gorilla"] = [encode_values(vs)]
        return pd.DataFrame(head)

    return (
        work.repartition(*key_cols, "chunk")
        .groupBy(*key_cols, "chunk")
        .applyInPandas(pack, out_schema)
    )


def decompress_tier(
    df: DataFrame,
    value_col: str = "value",
    key_cols: list[str] | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Inverse of :func:`compress_tier`: explode binary chunks back to
    (key, bucket, value) rows."""
    key_cols = key_cols or ["source"]
    out_schema = T.StructType(
        [df.schema[c] for c in key_cols]
        + [
            T.StructField(bucket_col, T.TimestampType()),
            T.StructField(value_col, T.DoubleType()),
        ]
    )

    def unpack(pdf: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, row in pdf.iterrows():
            ts = decode_timestamps(bytes(row["ts_dod"]))
            vs = decode_values(bytes(row["vals_gorilla"]))
            fr = pd.DataFrame({
                bucket_col: pd.to_datetime(ts, unit="s"),
                value_col: vs,
            })
            for c in key_cols:
                fr[c] = row[c]
            frames.append(fr[[*key_cols, bucket_col, value_col]])
        if not frames:
            return pd.DataFrame(columns=[*key_cols, bucket_col, value_col])
        return pd.concat(frames, ignore_index=True)

    return df.groupBy(*key_cols).applyInPandas(unpack, out_schema)
