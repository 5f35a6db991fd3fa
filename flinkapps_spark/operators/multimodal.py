"""Multimodal column plumbing (beyond-reference): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` — the Spark-side pattern for decode / feature-extract /
resize / frame-sample stages.

The decode libraries (PIL / torchaudio / av) are NOT in this container, so
the codec step is stubbed (``decode_image`` raises NotImplementedError) and
the tested path uses a deterministic byte-level feature extractor — the
Spark plumbing (schema, batch iteration, partitioning) is real and
oracle-verified (byte length / first byte / md5 are engine-independent).

Scale notes: binary payloads ride the shuffle only if you shuffle them —
keep decode stages map-side (mapInPandas before any groupBy), size
``spark.sql.files.maxPartitionBytes`` for payload width, and store payloads
in parquet binary columns so column pruning skips them when untouched.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

BINARY_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("first_byte", T.IntegerType()),
    T.StructField("content_md5", T.StringType()),
])


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column (UTF-8 bytes of the text fixture
    stand in for an image/audio payload)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def extract_byte_features(df: DataFrame, id_col: str = "doc_id",
                          payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas.

    Deterministic byte-level features (length, first byte, md5) so the
    DuckDB oracle can verify the full plumbing end-to-end.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": payloads.map(len).astype("int32"),
                "first_byte": payloads.map(
                    lambda b: b[0] if len(b) else -1).astype("int32"),
                "content_md5": payloads.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()),
            })

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=BINARY_META_SCHEMA)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode image payloads to (height, width, channels) + pixel features.

    STUB: requires an image codec (PIL/libvips), not present in this
    container.  The mapInPandas shape is identical to
    ``extract_byte_features`` — swap the body for `PIL.Image.open` when the
    dependency exists.
    """
    raise NotImplementedError(
        "image codecs unavailable in this environment; "
        "use extract_byte_features for the tested plumbing path")


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_bytes", T.IntegerType()),
    T.StructField("frame_sum", T.LongType()),
])


def sample_frames(df: DataFrame, id_col: str = "doc_id",
                  payload_col: str = "payload",
                  frame_bytes: int = 64, every_n: int = 4) -> DataFrame:
    """Frame sampling over binary payloads: split each payload into
    fixed-size frames, keep every ``every_n``-th, emit one row per kept
    frame — the real 1→N mapInPandas batch shape a video frame-sampler
    has (a true codec would swap the byte slicing for `av` decode; the
    Spark contract — schema, Arrow batches, row expansion, map-side
    execution before any shuffle — is exactly this).

    The per-frame feature (byte sum) is deterministic so the DuckDB
    oracle verifies the full path, not just row counts.
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            sizes: list[int] = []
            sums: list[int] = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                n_frames = (len(arr) + frame_bytes - 1) // frame_bytes
                for f in range(0, n_frames, every_n):
                    fr = arr[f * frame_bytes:(f + 1) * frame_bytes]
                    ids.append(int(i))
                    idxs.append(f)
                    sizes.append(len(fr))
                    sums.append(int(fr.sum()))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_bytes": pd.Series(sizes, dtype="int32"),
                "frame_sum": pd.Series(sums, dtype="int64"),
            })

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=FRAME_SCHEMA)


AUDIO_WINDOW = 64  # byte "samples" per analysis window

AUDIO_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("window_idx", T.LongType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.IntegerType()),
])


def audio_window_energy(df: DataFrame, id_col: str = "doc_id",
                        payload_col: str = "payload",
                        window: int = AUDIO_WINDOW) -> DataFrame:
    """Windowed audio energy over binary payloads: split each payload into
    fixed-size windows of byte "samples", emit RMS energy + peak per
    window — the 1→N mapInPandas shape of an audio feature stage (VAD,
    loudness normalization, silence trimming).  A true codec would swap
    the byte view for torchaudio/soundfile PCM decode; the Spark contract
    (Arrow batches, row expansion, map-side before any shuffle) is this.

    Determinism: the sum of squares is exact int64; rms = sqrt(ss/n) is
    one IEEE division + one correctly-rounded sqrt of the same values on
    both engines — the oracle reproduces it bit-identically.
    """
    import math

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            ns: list[int] = []
            rmss: list[float] = []
            peaks: list[int] = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                arr = np.frombuffer(bytes(b), dtype=np.uint8).astype(np.int64)
                for w in range(0, len(arr), window):
                    seg = arr[w:w + window]
                    ss = int((seg * seg).sum())
                    ids.append(int(i))
                    idxs.append(w // window)
                    ns.append(len(seg))
                    rmss.append(math.sqrt(ss / len(seg)))
                    peaks.append(int(seg.max()))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "window_idx": pd.Series(idxs, dtype="int64"),
                "n_samples": pd.Series(ns, dtype="int32"),
                "rms": pd.Series(rmss, dtype="float64"),
                "peak": pd.Series(peaks, dtype="int32"),
            })

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=AUDIO_SCHEMA)


RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("profile", T.ArrayType(T.DoubleType())),
])


def resize_profile(df: DataFrame, id_col: str = "doc_id",
                   payload_col: str = "payload",
                   n_bins: int = 8) -> DataFrame:
    """Resize stage over binary payloads: block-mean downsample of the
    byte sequence to a fixed n_bins profile — the 1-D analog of image
    resize (area interpolation), with the same mapInPandas contract a
    real resizer has (fixed-size output per row, numpy vectorized body).

    Bin i covers bytes[floor(i*n/bins) : floor((i+1)*n/bins)); the mean
    is an int-sum / int-count division, so the profile is bit-identical
    across engines (no float accumulation).
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, sizes, profs = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                arr = np.frombuffer(bytes(b), dtype=np.uint8).astype(np.int64)
                n = len(arr)
                prof = []
                for k in range(n_bins):
                    lo, hi = (k * n) // n_bins, ((k + 1) * n) // n_bins
                    prof.append(float(arr[lo:hi].sum() / (hi - lo))
                                if hi > lo else None)
                ids.append(int(i)); sizes.append(n); profs.append(prof)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_bytes": pd.Series(sizes, dtype="int32"),
                "profile": pd.Series(profs, dtype="object"),
            })

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# perceptual-hash near-dup (dHash over binary payloads)
# ---------------------------------------------------------------------------

PHASH_BLOCKS = 25          # 25 block means -> 24 gradient bits
PHASH_BITS = PHASH_BLOCKS - 1
PHASH_BANDS = 3            # 3 x 8-bit bands: pigeonhole covers hamming <= 2
PHASH_HAM_MAX = 2

PHASH_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("sig", T.LongType()),
])


def phash_signatures(df: DataFrame, id_col: str = "doc_id",
                     payload_col: str = "payload") -> DataFrame:
    """dHash-style perceptual signature of each binary payload: 25
    block-mean "pixels" -> 24 gradient bits (bit j set iff mean(block j) >
    mean(block j+1), compared as exact integer cross-products so no float
    enters the signature).

    This is the multimodal near-dup primitive: for real images the blocks
    would come from the decoded/resized grayscale plane (decode_image
    stub); byte-level blocks exercise the identical plumbing and are
    engine-reproducible (the DuckDB oracle recomputes the same signature
    from code points — the fixtures are pure ASCII, so bytes == code
    points).  Map-side only: one Arrow pass, no shuffle.
    """
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            sigs = []
            for raw in pdf[payload_col]:
                b = bytes(raw)
                n = len(b)
                bs, bl = [], []
                for j in range(PHASH_BLOCKS):
                    lo = (j * n) // PHASH_BLOCKS
                    hi = ((j + 1) * n) // PHASH_BLOCKS
                    blk = b[lo:hi]
                    bs.append(sum(blk))
                    bl.append(hi - lo)
                sig = 0
                for j in range(PHASH_BITS):
                    # mean(j) > mean(j+1) without division (empty block
                    # -> product 0 -> bit stays 0 on both engines)
                    if bs[j] * bl[j + 1] > bs[j + 1] * bl[j]:
                        sig |= 1 << j
                sigs.append(sig)
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "sig": pd.Series(sigs, dtype="int64"),
            })

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=PHASH_SCHEMA)


def phash_neardup_pairs(df: DataFrame, id_col: str = "doc_id",
                        payload_col: str = "payload",
                        ham_max: int = PHASH_HAM_MAX) -> DataFrame:
    """Near-dup pairs by perceptual-hash hamming distance ≤ ham_max.

    Banded hamming LSH: the 24-bit signature splits into 3 8-bit bands;
    candidates are pairs agreeing on AT LEAST ONE band (pigeonhole: k
    bands always catch hamming ≤ k-1, so 3 bands are LOSSLESS for the
    default ham_max=2), verified with an exact popcount of the XOR.
    Scale: the only shuffle is the band-key self-join — identical shape
    to the MinHash LSH band join; signatures are 8 bytes per doc, so the
    join input is tiny regardless of payload size, and payloads never
    ride a shuffle.
    """
    if ham_max > PHASH_BANDS - 1:
        raise ValueError(
            f"ham_max={ham_max} exceeds the lossless bound "
            f"{PHASH_BANDS - 1} of {PHASH_BANDS} bands")
    sig = phash_signatures(df, id_col, payload_col)
    bands = (sig.select(
        "doc_id", "sig",
        F.explode(F.array(*[F.lit(k) for k in range(PHASH_BANDS)]))
        .alias("k"))
        .withColumn("v", F.expr("(sig >> (8 * k)) & 255")))
    a = bands.select(F.col("doc_id").alias("doc_a"),
                     F.col("sig").alias("sig_a"), "k", "v")
    b = bands.select(F.col("doc_id").alias("doc_b"),
                     F.col("sig").alias("sig_b"), "k", "v")
    cand = (a.join(b, ["k", "v"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "sig_a", "sig_b").distinct())
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (cand.filter(ham <= ham_max)
            .select("doc_a", "doc_b", ham.cast("int").alias("hamming")))
