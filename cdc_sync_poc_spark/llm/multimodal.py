"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` kernels
(SURVEY §7.1 M6).

The real decode step (PIL/torchaudio/ffmpeg) is STUBBED — those libs are
not in this container — behind ``decode_image`` below, which raises
NotImplementedError. Everything Spark-side is real and tested: the
binary column plumbing, the metadata schema, the mapInPandas signature
and Arrow batch shape, and a deterministic fake feature-extractor whose
output the DuckDB oracle reproduces from the hex encoding.

Scale: media blobs make rows wide — the plans here keep the blob column
pruned until the decode stage, and mapInPandas streams Arrow batches
(spark.sql.execution.arrow.maxRecordsPerBatch) so executor memory is
bounded by batch size, not partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_sync_poc_spark.registry import register
from cdc_sync_poc_spark.sources.loader import load_table


def decode_image(data: bytes):  # pragma: no cover - stub
    """REAL DECODE STUB: would return a decoded image (PIL.Image).
    Image/audio libraries are not available in this environment; the
    pipeline uses deterministic fake features instead (see
    mm_decode_features)."""
    raise NotImplementedError(
        "media decode requires an image/audio library not present in this "
        "container; Spark-side plumbing (schema/partitioning/UDF batch "
        "shape) is implemented and tested with deterministic fake features"
    )


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> media rows: 16-byte fake payload (md5 of the text),
    modality tag, and typed metadata."""
    return media_frame(load_table(spark, sf_dir, "documents"))


def media_frame(docs: DataFrame) -> DataFrame:
    """media_table's projection over any frame with (doc_id, text) —
    shared with the streaming media-dedup screen so stream- and
    batch-derived media rows are bit-identical."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.unhex(F.md5("text")).alias("media_bytes"),
        (16 + F.col("doc_id") % 16).cast("int").alias("width"),
    )


@register(
    "mm_attach_meta",
    oracle="""
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
       octet_length(unhex(md5(text)))::BIGINT AS byte_len,
       substr(md5(text), 1, 8) AS header_hex,
       CAST(16 + doc_id % 16 AS INTEGER) AS width
FROM documents
""",
)
def mm_attach_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: construct media payloads + typed metadata
    and verify byte-accurate properties (length, header bytes) without
    any Python in the path."""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        "media_type",
        F.length("media_bytes").cast("long").alias("byte_len"),
        F.hex(F.expr("substring(media_bytes, 1, 4)")).alias("header_hex_uc"),
        "width",
    ).select(
        "doc_id",
        "media_type",
        "byte_len",
        F.lower("header_hex_uc").alias("header_hex"),
        "width",
    )


_FEATURE_SCHEMA = (
    "doc_id long, media_type string, brightness long, n_frames long"
)


def _default_kernel():
    """Build the default per-blob kernel (deterministic,
    oracle-reproducible): brightness = byte sum mod 256; n_frames =
    first byte mod 8 + 1.

    Defined as a ``<locals>`` function ON PURPOSE: cloudpickle ships
    such functions BY VALUE inside the task closure, whereas a
    module-level function is pickled by reference and would require
    ``cdc_sync_poc_spark`` to be importable on every executor — not
    true when the driver builds its session from an arbitrary cwd
    without shipping the package (the exact failure a vanilla-session
    run from /tmp exposes)."""

    def fake_feature_kernel(data: bytes) -> tuple[int, int]:
        return sum(data) % 256, data[0] % 8 + 1

    return fake_feature_kernel


# The drop-in point for a real decoder: swap this module-level kernel
# (e.g. ``multimodal.FEATURE_KERNEL = real_kernel`` where real_kernel
# calls decode_image + a feature net) and the mapInPandas plan —
# schema, blob pruning, Arrow batching, partitioning — is untouched.
# The kernel installed at PLAN BUILD time is captured into the
# serialized task closure (``_extract_features`` is a factory), so it
# ships to executors on a real cluster — no module re-import surprises.
FEATURE_KERNEL = _default_kernel()


def _extract_features(kernel=None):
    """Factory: an Arrow-batched mapInPandas generator applying the
    per-blob ``kernel`` (defaults to the installed FEATURE_KERNEL; fake
    by default, a real decode_image-based kernel drops in without
    changing the plan) to each media payload."""
    kernel = kernel or FEATURE_KERNEL

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["media_bytes"].map(kernel)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "brightness": feats.map(lambda t: t[0]),
                    "n_frames": feats.map(lambda t: t[1]),
                }
            )

    return gen


_HEX_VAL = "(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"


@register(
    "mm_decode_features",
    oracle=f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
       (list_sum(list_transform(range(1, 17),
          i -> (strpos('0123456789abcdef', substr(h, 2*i - 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(h, 2*i, 1)) - 1))) % 256)::BIGINT
         AS brightness,
       ({_HEX_VAL.format(pos=1)} * 16 + {_HEX_VAL.format(pos=2)}) % 8 + 1 AS n_frames
FROM m
""",
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over the binary media column —
    exercises the real Arrow batch path (schema in/out, blob handling);
    the oracle recomputes the same features from the hex encoding."""
    m = media_table(spark, sf_dir).select("doc_id", "media_type", "media_bytes")
    out = m.mapInPandas(_extract_features(), schema=_FEATURE_SCHEMA)
    return out.select(
        "doc_id", "media_type", "brightness", F.col("n_frames").cast("long")
    )


@register(
    "mm_frame_sample",
    oracle=f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
meta AS (
  SELECT doc_id, h,
         ({_HEX_VAL.format(pos=1)} * 16 + {_HEX_VAL.format(pos=2)}) % 8 + 1 AS n_frames
  FROM m
  WHERE doc_id % 3 = 2  -- videos only (media_type routing)
)
SELECT doc_id, CAST(unnest(range(0, n_frames)) AS INTEGER) AS frame_idx,
       md5(concat(h, ':', CAST(unnest(range(0, n_frames)) AS VARCHAR))) AS frame_key
FROM meta
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing for video rows: modality routing (only
    media_type='video' rows fan out), per-row frame explode driven by
    the decoded frame count, and a deterministic per-frame content key.
    The actual frame decode is the stubbed step (decode_image); the
    Spark-side shape — filter -> explode(sequence) -> per-frame rows —
    is the real pipeline and is what the oracle checks. Scale: fan-out
    is bounded by n_frames; rows stay within their partition (map-only,
    no shuffle)."""
    m = media_table(spark, sf_dir)
    frames = (
        m.filter(F.col("media_type") == "video")
        .withColumn("h", F.lower(F.hex("media_bytes")))
        .withColumn(
            "n_frames",
            (F.expr("conv(substring(h, 1, 2), 16, 10)").cast("long") % 8 + 1).cast("int"),
        )
        .select(
            "doc_id",
            "h",
            F.explode(F.expr("sequence(0, n_frames - 1)")).alias("frame_idx"),
        )
    )
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.md5(F.concat(F.col("h"), F.lit(":"), F.col("frame_idx").cast("string"))).alias(
            "frame_key"
        ),
    )


MAX_EDGE = 224  # resize target: longest edge (the vision-model input)


@register(
    "mm_resize",
    oracle=f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
meta AS (
  SELECT doc_id, h,
         CAST(16 + doc_id % 16 AS BIGINT) AS src_w,
         CAST((strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) AS BIGINT)
           % 32 + 8 AS src_h
  FROM m WHERE doc_id % 3 = 0  -- images only (media_type routing)
),
dims AS (
  SELECT doc_id, h, src_w, src_h,
         src_w * {MAX_EDGE} // greatest(src_w, src_h) AS dst_w,
         src_h * {MAX_EDGE} // greatest(src_w, src_h) AS dst_h
  FROM meta
)
SELECT doc_id, src_w, src_h, dst_w, dst_h,
       md5(concat(h, ':', CAST(dst_w AS VARCHAR), 'x',
                  CAST(dst_h AS VARCHAR))) AS resized_key
FROM dims
""",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing for image rows — the remaining leg of the
    decode / feature-extract / resize / frame-sample quartet: modality
    routing (only media_type='image' fans in), source dims from typed
    metadata + payload bytes, aspect-preserving target dims to a
    MAX_EDGE longest side in pure BIGINT arithmetic (exact in both
    engines — no float scale factor), and a deterministic content key
    for the resized artifact. The pixel resample itself is the stubbed
    decode step (decode_image); swapping a real kernel in replaces the
    key computation with actual bytes while this plan — filter,
    map-only dim math, no shuffle — is unchanged at any corpus size."""
    m = media_table(spark, sf_dir)
    meta = (
        m.filter(F.col("media_type") == "image")
        .withColumn("h", F.lower(F.hex("media_bytes")))
        .select(
            "doc_id",
            "h",
            F.col("width").cast("long").alias("src_w"),
            (
                F.expr("conv(substring(h, 3, 2), 16, 10)").cast("long") % 32 + 8
            ).alias("src_h"),
        )
    )
    dst_w = F.expr(f"src_w * {MAX_EDGE} div greatest(src_w, src_h)")
    dst_h = F.expr(f"src_h * {MAX_EDGE} div greatest(src_w, src_h)")
    return meta.select(
        "doc_id",
        "src_w",
        "src_h",
        dst_w.alias("dst_w"),
        dst_h.alias("dst_h"),
        F.md5(
            F.concat_ws(
                "",
                F.col("h"),
                F.lit(":"),
                dst_w.cast("string"),
                F.lit("x"),
                dst_h.cast("string"),
            )
        ).alias("resized_key"),
    )


@register(
    "mm_integrity_check",
    oracle="""
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
         md5(text) AS payload_hex,
         CASE WHEN doc_id % 37 = 0 THEN sha256(reverse(md5(text)))
              ELSE sha256(md5(text)) END AS stored_sha
  FROM documents
)
SELECT doc_id, media_type,
       CASE WHEN sha256(payload_hex) = stored_sha THEN 'OK'
            ELSE 'CORRUPT' END AS status
FROM m
""",
)
def mm_integrity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blob integrity audit: recompute each payload's checksum and
    compare against the manifest's stored digest, flagging mismatches
    for the dead-letter path — the fixity check every media lake runs
    before spending GPU time decoding corrupt bytes. Corruption is
    simulated deterministically (every 37th manifest digest was
    computed from bit-rotted bytes). The checksum convention hashes
    the lowercase hex rendering of the payload so the DuckDB oracle
    (whose sha256 is VARCHAR-only) reproduces it bit-for-bit; JVM-side
    this is two sha2/hex expressions per row — map-only, blob column
    read once, no Python."""
    m = media_table(spark, sf_dir)
    payload_hex = F.lower(F.hex("media_bytes"))
    stored = F.when(
        F.col("doc_id") % 37 == 0, F.sha2(F.reverse(payload_hex), 256)
    ).otherwise(F.sha2(payload_hex, 256))
    return m.select(
        "doc_id",
        "media_type",
        F.when(F.sha2(payload_hex, 256) == stored, "OK")
        .otherwise("CORRUPT")
        .alias("status"),
    )


PHASH_BITS = 16  # surrogate fingerprint width (production pHash: 64)
PHASH_HAMMING_MAX = 3  # mm_dedup_phash near-dup threshold (of 16 bits)
# Standard d+1 banding: split the fingerprint into HAMMING_MAX + 1
# bands so any pair within distance d differs in at most d bands and
# therefore MUST agree on >= one band (pigeonhole over d+1 bands).
# With the 16-bit surrogate that is 4 bands x 4 bits (16 bucket values
# per band — fine at test scale); production 64-bit pHash gives
# 4 bands x 16 bits = 65 536 buckets per band, which is what shards
# the candidate join at 100 TB.
PHASH_BANDS = PHASH_HAMMING_MAX + 1
_PHASH_BAND_BITS = PHASH_BITS // PHASH_BANDS
_PHASH_BAND_MASK = (1 << _PHASH_BAND_BITS) - 1


def phash_band_frame(m: DataFrame) -> DataFrame:
    """(doc_id, phash, band_id, band_key) for a media frame — the
    16-bit surrogate fingerprint from the payload bytes' nibble
    high-bits plus its PHASH_BANDS banding, all map-side expressions
    reading the blob once. Shared by mm_dedup_phash and the streaming
    media-dedup screen (streaming/mm_index.py) so both paths band
    bit-identically and one stored index serves stream and backfill."""
    payload_hex = F.lower(F.hex("media_bytes"))
    bits = []
    for i in range(1, PHASH_BITS + 1):
        bits.append(
            f"IF(contains('89abcdef', substr(ph, {i}, 1)),"
            f" {1 << (PHASH_BITS - i)}, 0)"
        )
    ph = m.select("doc_id", payload_hex.alias("ph")).select(
        "doc_id",
        F.expr(" + ".join(bits)).cast("bigint").alias("phash"),
    )
    band_exprs = ", ".join(
        f"shiftright(phash, {(PHASH_BANDS - 1 - b) * _PHASH_BAND_BITS})"
        f" & {_PHASH_BAND_MASK}"
        for b in range(PHASH_BANDS)
    )
    return ph.select(
        "doc_id",
        "phash",
        F.posexplode(F.expr(f"array({band_exprs})")).alias(
            "band_id", "band_key"
        ),
    )


@register(
    "mm_dedup_phash",
    oracle=f"""
WITH m AS (
  SELECT doc_id, lower(hex(unhex(md5(text)))) AS payload_hex FROM documents
),
ph AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(1, {PHASH_BITS + 1}),
            i -> CASE WHEN contains('89abcdef', substr(payload_hex, i, 1))
                      THEN 1 << ({PHASH_BITS} - i) ELSE 0 END))::BIGINT
           AS BIGINT) AS phash
  FROM m
),
bd AS (
  SELECT doc_id, phash, b AS band_id,
         (phash >> (({PHASH_BANDS - 1} - b) * {_PHASH_BAND_BITS}))
           & {_PHASH_BAND_MASK} AS band_key
  FROM ph CROSS JOIN range(0, {PHASH_BANDS}) t(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, a.phash AS pa,
                  c.doc_id AS doc_b, c.phash AS pb
  FROM bd a JOIN bd c
    ON a.band_id = c.band_id AND a.band_key = c.band_key
   AND a.doc_id < c.doc_id
)
SELECT doc_a, doc_b, bit_count(xor(pa, pb))::BIGINT AS hamming
FROM cand
WHERE bit_count(xor(pa, pb)) <= {PHASH_HAMMING_MAX}
""",
)
def mm_dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup over the BINARY media column — the
    image/video twin of MinHash-LSH text dedup: a 16-bit fingerprint
    per blob, split into PHASH_HAMMING_MAX + 1 = 4 bands (standard
    d+1 banding: a pair within Hamming distance d differs in at most
    d bands, so it MUST agree on at least one — zero candidate misses
    up to the threshold, by pigeonhole), candidates verified by EXACT
    Hamming distance. The real pHash
    (DCT over decoded pixels) lives behind the stubbed decode like
    every mm kernel (module docstring); the surrogate derives the
    fingerprint from the payload bytes' nibble high-bits, so the
    banding/verification PLUMBING — the part that must scale — is real
    and oracle-checked.

    Scale: fingerprint + band keys are map-side expressions reading
    the blob column once; candidates come from a band equi-join (never
    all-pairs); the verify is one xor + bit_count per candidate. The
    blob column prunes out of the join entirely — only the 16-bit
    fingerprints shuffle. The input is SPREAD before the banding
    (r15): the candidate join's probe side inherits the scan's
    parallelism, and on a single-split input the whole quadratic
    candidate evaluation ran in ONE task — measured at the derived sf1
    fixture: 64-68 s FLAT across 8 vs 32 cores before, ~15x less wall
    after spreading (BENCH_r15_sf1.json); a real lake's many-file scan
    makes the spread a no-op."""
    from cdc_sync_poc_spark.sources.loader import spread_small_input

    return phash_pairs_frame(
        phash_band_frame(spread_small_input(media_table(spark, sf_dir)))
    )


# Candidate generation runs on a FINER multi-index than the stored
# 4 x 4-bit banding (r14): 2 bands of 8 bits, probing each band key
# plus its 8 single-bit flips. Pigeonhole: <= PHASH_HAMMING_MAX = 3
# errors across 2 bands leave some band with <= floor(3/2) = 1 error,
# so every true pair is caught — the SAME final set as the 4-band
# equi-join (both are supersets of the hamming<=3 pairs, and the
# exact-Hamming verify is unchanged), but a random band collision
# costs 9/256 instead of 1/16 per band: measured 3.12M -> 0.88M
# candidate evaluations at sf0.1. Wall time at bench SF moves little
# (interleaved A/B min 1.05 -> 0.98 s — the query there is bound by
# the distinct + the 133k-pair output, which is quadratic by DESIGN
# of the 16-bit surrogate: ~1% of all pairs sit within hamming 3);
# the 3.5x candidate cut is the term that grows with the corpus.
# With a production 64-bit pHash the same shape gives 2 x 32-bit
# bands (33 probe keys, 2^32 bucket values).
_PHASH_MI_BANDS = 2
# Recall-completeness precondition (ADVICE r14): the radius-1
# flip-probe is exhaustive only while the worst band carries <= 1
# error (floor(PHASH_HAMMING_MAX / bands) <= 1) and the width splits
# evenly; raising PHASH_HAMMING_MAX or changing PHASH_BITS without
# rethinking the banding would silently drop true pairs (the DuckDB
# oracle auto-scales its banding via PHASH_BANDS = hamming_max + 1).
assert (
    PHASH_HAMMING_MAX // _PHASH_MI_BANDS <= 1
    and PHASH_BITS % _PHASH_MI_BANDS == 0
), "phash multi-index banding no longer covers PHASH_HAMMING_MAX"
_PHASH_MI_BITS = PHASH_BITS // _PHASH_MI_BANDS
_PHASH_MI_MASK = (1 << _PHASH_MI_BITS) - 1
_PHASH_MI_FLIPS = ", ".join(str(1 << i) for i in range(_PHASH_MI_BITS))


def phash_pairs_frame(bd: DataFrame) -> DataFrame:
    """Multi-index candidate join + exact-Hamming verify over a banded
    fingerprint frame: the candidate/verify half of mm_dedup_phash,
    shared with the streaming media-dedup screen's single-batch
    equivalence pin. ``bd`` is the stored 4-band index shape
    (phash_band_frame); candidates are generated from the finer
    2 x 8-bit flip-probe index derived from the fingerprint column
    (comment above) — the stored banding stays the on-disk contract."""
    ph = bd.filter(F.col("band_id") == 0).select("doc_id", "phash")
    mi_bands = ", ".join(
        f"struct({b} AS vb, shiftright(phash,"
        f" {(_PHASH_MI_BANDS - 1 - b) * _PHASH_MI_BITS})"
        f" & {_PHASH_MI_MASK} AS bv)"
        for b in range(_PHASH_MI_BANDS)
    )
    build = ph.select(
        F.col("doc_id").alias("doc_b"),
        F.col("phash").alias("pb"),
        F.explode(F.expr(f"array({mi_bands})")).alias("b"),
    ).select("doc_b", "pb", F.col("b.vb").alias("vb"), F.col("b.bv").alias("bv"))
    probe = (
        ph.select(
            F.col("doc_id").alias("doc_a"),
            F.col("phash").alias("pa"),
            F.explode(F.expr(f"array({mi_bands})")).alias("b"),
        )
        .select(
            "doc_a",
            "pa",
            F.col("b.vb").alias("vb"),
            F.explode(
                F.expr(f"transform(array(0, {_PHASH_MI_FLIPS}),"
                       f" m -> b.bv ^ m)")
            ).alias("bk"),
        )
    )
    cand = (
        probe.join(
            build,
            (probe.vb == build.vb)
            & (probe.bk == build.bv)
            & (probe.doc_a < build.doc_b),
        )
        .select("doc_a", "pa", "doc_b", "pb")
        .distinct()
    )
    ham = F.expr("bit_count(pa ^ pb)")
    return (
        cand.withColumn("hamming", ham.cast("bigint"))
        .filter(F.col("hamming") <= PHASH_HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
    )
