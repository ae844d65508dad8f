"""Multimodal columns: images/audio/video as opaque binary + metadata.

Training-data pipelines carry media as ``binary`` columns with typed
metadata alongside (BASELINE.json north star). The Spark-side plumbing
here — schema, batching, partition sizing, UDF signatures — is real
and tested; the actual codec calls are stubbed behind
``NotImplementedError`` / deterministic fakes because media libraries
(PIL/ffmpeg/torchaudio) are not in this container. Swapping a stub for
a real decoder changes ONE function body, not the pipeline.

Scale design:
- media bytes stay in executor memory only per-batch (mapInPandas
  iterator — never a full-partition materialization);
- metadata-only operations (filtering by width/duration, sampling)
  never touch the binary column thanks to parquet column pruning;
- decode fan-out uses ``repartition`` on a content hash so hot shards
  (e.g. one crawl host's images) spread evenly.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal schema: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_DIM = 8

_FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, payload_fp string, "
    f"features array<double>"
)


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derived
    from the id (stands in for real image/audio blobs)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes([(i * 7 + j) % 256 for j in range(128 + i)])
        rows.append((i, kind, f"application/x-fake-{kind}", payload, {"w": str(64 + i)}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(payload: bytes) -> "object":
    """Real decoder hook. Container has no image libs — STUB.

    Replace with e.g. PIL.Image.open(io.BytesIO(payload)) in a real
    deployment; everything downstream only needs the ndarray.
    """
    raise NotImplementedError("image codec not available in this environment")


def _fake_feature_vector(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real embed/decode step: byte-moment
    statistics over the payload (stable, environment-independent)."""
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    out = []
    for k in range(dim):
        sl = payload[k::dim]
        out.append((sum(sl) / len(sl)) / 255.0 if sl else 0.0)
    return out


def extract_features(media: DataFrame) -> DataFrame:
    """Per-media feature extraction via mapInPandas (Arrow-batched).

    The batch iterator shape is exactly what a real decoder needs:
    payload bytes arrive per-batch, features leave as array<double>,
    and the binary column is dropped on output so downstream stages
    never shuffle blobs.
    """
    import hashlib

    import pandas as pd

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                    "payload_fp": pdf["payload"].map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "features": pdf["payload"].map(_fake_feature_vector),
                }
            )

    # fan_out first: a splits-starved media scan would hand mapInPandas
    # a single Arrow batch stream = one Python worker regardless of
    # cores (see operators.scale).
    from soccerpredictor_spark.operators.scale import fan_out

    return fan_out(media).mapInPandas(op, schema=_FEATURES_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the documents fixture:
    payload = the document's UTF-8 bytes standing in for a real blob
    (kind round-robins by doc_id). Lets the multimodal plumbing run —
    and be oracle-checked — against driver-provided data."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.create_map(F.lit("lang"), F.col("lang")).alias("meta"),
    )


def decode_profile(media: DataFrame) -> DataFrame:
    """Byte-level media profile through the REAL decode plumbing
    (mapInPandas over Arrow batches): (media_id, kind, n_bytes,
    payload_fp). The md5/byte-length outputs are SQL-expressible, so
    this path — unlike the feature vectors — gets a DuckDB oracle."""
    return extract_features(media).select("media_id", "kind", "n_bytes", "payload_fp")


def decode_profile_sql() -> str:
    """DuckDB twin of decode_profile over documents-derived media
    (md5 of a VARCHAR hashes its UTF-8 bytes; strlen counts them)."""
    return """
SELECT doc_id AS media_id,
       CASE CAST(doc_id % 3 AS INT)
            WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(text) AS payload_fp
FROM documents
"""


def metadata_filter(media: DataFrame, min_width: int) -> DataFrame:
    """Metadata-only predicate: never reads the payload column (parquet
    column pruning keeps the scan narrow)."""
    return media.filter(F.col("meta")["w"].try_cast("int") >= min_width).select(
        "media_id", "kind", "mime"
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: expands each video row into frame
    tasks (real decoder would emit frames; stub emits frame indices).
    Demonstrates the explode-based fan-out that distributes decode work."""
    frames = F.sequence(F.lit(0), F.lit(every_n - 1))
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_idx"))
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Per-kind payload statistics WITHOUT decoding: row count and
    total/min/max byte sizes. Pure JVM-side byte-length arithmetic —
    the triage query you run over 100 TB of media before spending
    decode cycles; the payload column is read but never leaves the
    scan (no shuffle carries blobs — only 4 longs per kind)."""
    n_bytes = F.length(F.col("payload")).cast("long")
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum(n_bytes).alias("total_bytes"),
            F.min(n_bytes).alias("min_bytes"),
            F.max(n_bytes).alias("max_bytes"),
        )
        .orderBy("kind")
    )


def media_stats_sql() -> str:
    """DuckDB twin over documents-derived media (strlen = UTF-8 byte
    count, matching length() on the encoded binary)."""
    return """
SELECT CASE CAST(doc_id % 3 AS INT)
            WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       COUNT(*) AS n_media,
       CAST(SUM(CAST(strlen(text) AS BIGINT)) AS BIGINT) AS total_bytes,
       MIN(CAST(strlen(text) AS BIGINT)) AS min_bytes,
       MAX(CAST(strlen(text) AS BIGINT)) AS max_bytes
FROM documents
GROUP BY 1
ORDER BY 1
"""


def media_dedup(media: DataFrame) -> DataFrame:
    """Exact media dedup by payload content hash — the first pass any
    100 TB media corpus runs before perceptual/embedding dedup: md5 of
    the raw bytes, computed IN THE SCAN projection, then a hash-only
    groupBy. Blobs never shuffle: only (md5, kind, media_id, n_bytes)
    leave the scan stage, so the exchange is ~50 bytes/row regardless
    of payload size.

    Output: per duplicate-group (content hash), the number of copies,
    the canonical keeper (min media_id — the same keep-min rule as the
    text-side dedup family), and bytes reclaimed by dropping the rest.
    Sorted by the hash for a deterministic driver comparison.
    """
    n_bytes = F.length(F.col("payload")).cast("long")
    return (
        media.select(
            F.md5(F.col("payload")).alias("payload_md5"),
            F.col("kind"),
            F.col("media_id"),
            n_bytes.alias("n_bytes"),
        )
        .groupBy("payload_md5", "kind")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("media_id").alias("keep_media_id"),
            (F.sum("n_bytes") - F.max("n_bytes")).alias("bytes_reclaimed"),
        )
        .orderBy("payload_md5", "kind")
    )


def media_dedup_sql() -> str:
    """DuckDB twin over documents-derived media (md5 of VARCHAR hashes
    its UTF-8 bytes — the same bytes ``encode(text)`` produced)."""
    return """
SELECT md5(text) AS payload_md5,
       CASE CAST(doc_id % 3 AS INT)
            WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       COUNT(*) AS n_copies,
       MIN(doc_id) AS keep_media_id,
       CAST(SUM(CAST(strlen(text) AS BIGINT))
            - MAX(CAST(strlen(text) AS BIGINT)) AS BIGINT) AS bytes_reclaimed
FROM documents
GROUP BY 1, 2
ORDER BY 1, 2
"""


#: chunk geometry for partial-duplicate detection.
CHUNK_BYTES = 64
N_CHUNKS = 8
#: minimum shared chunks for a partial-dup pair.
MIN_SHARED_CHUNKS = 4
#: df-cap: a chunk hash seen in more media than this generates no
#: candidate pairs (the dedup_jaccard shingle-cap pattern — a
#: boilerplate prefix shared by millions of files must not fan out).
MAX_MEDIA_PER_CHUNK = 100


def media_chunk_dedup(media: DataFrame) -> DataFrame:
    """Partial-duplicate media via positional chunk hashing: each
    payload's first N_CHUNKS x CHUNK_BYTES bytes are hashed per 64-byte
    slice IN THE SCAN (blobs never shuffle — only (media_id, idx,
    md5) rows leave the stage, the ``media_dedup`` discipline); media
    sharing >= MIN_SHARED_CHUNKS same-position hashes are reported
    with their chunk containment. Catches truncations, re-encodes of
    identical prefixes, and partially-corrupted copies that exact
    whole-payload dedup misses.

    Scale: candidates come ONLY from the (idx, hash)-bucketed
    self-join, df-capped at MAX_MEDIA_PER_CHUNK — never an all-pairs
    comparison; per-media chunk counts attach before the join so the
    containment needs no second pass.
    """
    idxs = F.sequence(F.lit(0), F.lit(N_CHUNKS - 1))
    chunks = (
        media.select(
            "media_id",
            F.length(F.col("payload")).alias("nb"),
            F.explode(idxs).alias("idx"),
            F.col("payload"),
        )
        .filter(F.col("nb") > F.col("idx") * CHUNK_BYTES)
        .select(
            "media_id",
            "idx",
            F.md5(
                F.expr(f"substring(payload, idx * {CHUNK_BYTES} + 1, {CHUNK_BYTES})")
            ).alias("h"),
        )
    )
    from pyspark.sql import Window as W

    sized = chunks.withColumn(
        "n_chunks", F.count(F.lit(1)).over(W.partitionBy("media_id"))
    ).withColumn("df", F.count(F.lit(1)).over(W.partitionBy("idx", "h")))
    capped = sized.filter(F.col("df") <= MAX_MEDIA_PER_CHUNK)
    a = capped.select(
        "idx", "h", F.col("media_id").alias("media_a"),
        F.col("n_chunks").alias("n_chunks_a"),
    )
    b = capped.select(
        "idx", "h", F.col("media_id").alias("media_b"),
        F.col("n_chunks").alias("n_chunks_b"),
    )
    pairs = (
        a.join(b, ["idx", "h"])
        .filter(F.col("media_a") < F.col("media_b"))
        .groupBy("media_a", "media_b", "n_chunks_a", "n_chunks_b")
        .agg(F.count(F.lit(1)).alias("shared_chunks"))
        .filter(F.col("shared_chunks") >= MIN_SHARED_CHUNKS)
    )
    return pairs.select(
        "media_a",
        "media_b",
        "shared_chunks",
        "n_chunks_a",
        "n_chunks_b",
        (
            F.col("shared_chunks").cast("double")
            / F.least("n_chunks_a", "n_chunks_b").cast("double")
        ).alias("chunk_containment"),
    )


def media_chunk_dedup_sql() -> str:
    """Twin over the documents-derived media table: payload =
    encode(text) and the fixture text is ASCII, so character slicing
    of the VARCHAR equals byte slicing of the BLOB and md5(VARCHAR)
    hashes the same bytes (the ``decode_profile_sql`` identity).
    DuckDB cannot slice BLOBs directly."""
    return f"""
WITH chunks AS (
  SELECT doc_id AS media_id, u.idx,
         md5(substring(text, u.idx * {CHUNK_BYTES} + 1, {CHUNK_BYTES})) AS h
  FROM documents, (SELECT unnest(range({N_CHUNKS})) AS idx) u
  WHERE strlen(text) > u.idx * {CHUNK_BYTES}
),
sized AS (
  SELECT *, COUNT(*) OVER (PARTITION BY media_id) AS n_chunks,
         COUNT(*) OVER (PARTITION BY idx, h) AS df
  FROM chunks
),
capped AS (SELECT * FROM sized WHERE df <= {MAX_MEDIA_PER_CHUNK}),
pairs AS (
  SELECT a.media_id AS media_a, b.media_id AS media_b,
         a.n_chunks AS n_chunks_a, b.n_chunks AS n_chunks_b,
         COUNT(*) AS shared_chunks
  FROM capped a JOIN capped b USING (idx, h)
  WHERE a.media_id < b.media_id
  GROUP BY 1, 2, 3, 4
)
SELECT media_a, media_b, shared_chunks, n_chunks_a, n_chunks_b,
       CAST(shared_chunks AS DOUBLE)
         / CAST(least(n_chunks_a, n_chunks_b) AS DOUBLE) AS chunk_containment
FROM pairs
WHERE shared_chunks >= {MIN_SHARED_CHUNKS}
"""


# --------------------------------------------------------------------------
# scene segmentation over sampled video frames (stubbed decode)
# --------------------------------------------------------------------------

#: frames sampled per video and the boundary threshold on the fake
#: frame-signature distance (signatures are md5-derived ints mod 1000).
SCENE_FRAMES = 12
SCENE_SIG_MOD = 1000
SCENE_THRESHOLD = 400


def media_scene_segments(media: DataFrame) -> DataFrame:
    """Scene segmentation plumbing for video: sample SCENE_FRAMES
    frames per video, compute a per-frame signature, and cut a scene
    boundary wherever consecutive signatures differ by more than the
    threshold — the shot-boundary-detection shape (pairwise frame
    difference -> threshold -> segment rollup) with the actual pixel
    decode STUBBED (this container has no codecs): the signature is
    md5(payload_fp ':' frame_idx) mod 1000, a deterministic fake that
    exercises the real distribution — payload fingerprints come
    through the Arrow-batched mapInPandas decode path, the frame
    fan-out is a zero-shuffle explode, and the boundary pass is ONE
    media-keyed window over <= 12 rows per video. Blobs never
    shuffle; only (media_id, fingerprint) leaves the decode stage.
    """
    from pyspark.sql import Window

    fp = extract_features(media.filter(F.col("kind") == "video")).select(
        "media_id", "payload_fp"
    )
    frames = fp.select(
        "media_id",
        "payload_fp",
        F.explode(F.expr(f"sequence(0, {SCENE_FRAMES - 1})")).alias("frame_idx"),
    )
    sig = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("payload_fp"),
                        F.lit(":"),
                        F.col("frame_idx").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % SCENE_SIG_MOD
    )
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    sigs = frames.select("media_id", "frame_idx", sig.alias("sig"))
    marked = sigs.select(
        "media_id",
        "frame_idx",
        "sig",
        F.when(
            F.abs(F.col("sig") - F.lag("sig").over(w)) > SCENE_THRESHOLD, 1
        )
        .otherwise(0)
        .alias("boundary"),
    )
    return (
        marked.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            (F.sum("boundary") + 1).alias("n_scenes"),
            F.max("sig").alias("max_sig"),
        )
        .orderBy("media_id")
    )


def media_scene_segments_sql() -> str:
    """DuckDB twin over documents-derived media (payload_fp =
    md5(text); videos are doc_id % 3 = 2)."""
    return f"""
WITH fp AS (
  SELECT doc_id AS media_id, md5(text) AS payload_fp
  FROM documents WHERE doc_id % 3 = 2
),
frames AS (
  SELECT media_id, payload_fp, gs.g AS frame_idx
  FROM fp, LATERAL (SELECT unnest(range(0, {SCENE_FRAMES})) AS g) gs
),
sigs AS (
  SELECT media_id, frame_idx,
         CAST('0x' || substr(md5(payload_fp || ':'
                || CAST(frame_idx AS VARCHAR)), 1, 8) AS BIGINT)
           % {SCENE_SIG_MOD} AS sig
  FROM frames
),
marked AS (
  SELECT media_id, frame_idx, sig,
         CASE WHEN abs(sig - lag(sig) OVER (PARTITION BY media_id
                ORDER BY frame_idx)) > {SCENE_THRESHOLD}
              THEN 1 ELSE 0 END AS boundary
  FROM sigs
)
SELECT media_id, COUNT(*) AS n_frames,
       CAST(SUM(boundary) + 1 AS BIGINT) AS n_scenes,
       CAST(MAX(sig) AS BIGINT) AS max_sig
FROM marked GROUP BY media_id ORDER BY media_id
"""


# --------------------------------------------------------------------------
# perceptual (dHash-style) image near-duplicate detection
# --------------------------------------------------------------------------

#: pseudo-pixel grid: byte intensities fold into this many cells
#: (position mod PHASH_CELLS), adjacent-cell gradients give the bits.
PHASH_CELLS = 64
#: gradient bits = cells - 1, packed into ONE signed int64 (< 2^63 so
#: both engines stay in plain BIGINT arithmetic — no sign wrap).
PHASH_BITS = PHASH_CELLS - 1
#: LSH banding over the 63 bits: 3 bands x 21 bits.
PHASH_BANDS = 3
PHASH_BAND_BITS = 21
#: verified-pair acceptance: Hamming distance over the 63 bits.
PHASH_MAX_HAMMING = 8
#: df-cap — a band bucket bigger than this generates no candidates
#: (the media_chunk_dedup / dedup_jaccard blocking contract).
MAX_MEDIA_PER_PHASH_BAND = 100


def media_phash(media: DataFrame) -> DataFrame:
    """dHash-style perceptual fingerprint per media payload through
    the REAL Arrow decode plumbing (mapInPandas): (media_id, phash).

    A real deployment decodes pixels and compares adjacent downscaled
    luminances; the container has no codecs (see ``decode_image``),
    so the deterministic stand-in "image" is the byte stream folded
    into PHASH_CELLS positional cells — cell c holds the (sum, count)
    of bytes at positions ≡ c (mod PHASH_CELLS), i.e. a stride
    downscale of the payload. Bit c = 1 iff mean(cell c+1) >
    mean(cell c), compared CROSS-MULTIPLIED in exact integers
    (sum1*cnt0 > sum0*cnt1 — no float means), so the hash is
    bit-identical across engines and locality-preserving: payloads
    differing in a few bytes differ in few gradient bits — exactly
    the property banding exploits. Swapping in a real decoder changes
    only the intensity extraction, not the hash/banding pipeline.
    """
    import numpy as np
    import pandas as pd

    def phash_of(b: bytes | None) -> int:
        if b is None:
            b = b""
        arr = np.frombuffer(bytes(b), dtype=np.uint8)
        sums = [0] * PHASH_CELLS
        cnts = [0] * PHASH_CELLS
        for c in range(PHASH_CELLS):
            sl = arr[c::PHASH_CELLS]
            sums[c] = int(sl.sum())
            cnts[c] = int(sl.size)
        h = 0
        for c in range(PHASH_BITS):
            if sums[c + 1] * cnts[c] > sums[c] * cnts[c + 1]:
                h |= 1 << c
        return h

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": pdf["payload"].map(phash_of).astype("int64"),
                }
            )

    from soccerpredictor_spark.operators.scale import fan_out

    return fan_out(media).mapInPandas(op, schema="media_id long, phash long")


def media_phash_neardup(media: DataFrame) -> DataFrame:
    """Perceptual near-duplicate media pairs: dHash fingerprints,
    banded-LSH candidate generation, exact Hamming verification —
    the image-side analogue of ``dedup_simhash`` (closes the
    image-near-dup gap: ``media_dedup`` only catches byte-exact
    copies; this catches re-encodes/small edits whose perceptual
    fingerprints stay close).

    Scale: candidates come ONLY from media sharing one of
    PHASH_BANDS 21-bit band values, df-capped at
    MAX_MEDIA_PER_PHASH_BAND per bucket (an over-dense bucket — a
    solid-color thumbnail band — generates nothing rather than an
    all-pairs blowup); the verify step is one integer
    bit_count(a XOR b) per candidate. Only (media_id, 3 x 21-bit
    ints) shuffle — payloads never leave the scan stage.
    """
    fp = media_phash(media)
    mask = (1 << PHASH_BAND_BITS) - 1
    bands = fp.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band_idx"),
                        F.shiftright(F.col("phash"), j * PHASH_BAND_BITS)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for j in range(PHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("media_id", "phash", F.col("b.band_idx").alias("band_idx"), F.col("b.band_val").alias("band_val"))
    sizes = (
        bands.groupBy("band_idx", "band_val")
        .agg(F.count(F.lit(1)).alias("n_in_bucket"))
        .filter(F.col("n_in_bucket") <= MAX_MEDIA_PER_PHASH_BAND)
    )
    capped = bands.join(sizes.select("band_idx", "band_val"), ["band_idx", "band_val"])
    a = capped.select(
        "band_idx", "band_val",
        F.col("media_id").alias("media_a"), F.col("phash").alias("h_a"),
    )
    b = capped.select(
        "band_idx", "band_val",
        F.col("media_id").alias("media_b"), F.col("phash").alias("h_b"),
    )
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("media_a") < F.col("media_b"))
        .groupBy("media_a", "media_b", "h_a", "h_b")
        .agg(F.countDistinct("band_idx").cast("long").alias("n_bands"))
    )
    hamming = F.bit_count(
        F.col("h_a").bitwiseXOR(F.col("h_b"))
    ).cast("int")
    return (
        cand.select("media_a", "media_b", hamming.alias("hamming"), "n_bands")
        .filter(F.col("hamming") <= PHASH_MAX_HAMMING)
        .orderBy("media_a", "media_b")
    )


def media_phash_neardup_sql() -> str:
    """DuckDB twin over documents-derived media: ascii(substr) on the
    pure-ASCII fixture text reproduces the payload bytes the Spark
    kernel folds (byte == code point for ASCII, checked in tests)."""
    mask = (1 << PHASH_BAND_BITS) - 1
    bands_sel = " UNION ALL ".join(
        f"SELECT media_id, phash, {j} AS band_idx, "
        f"(phash >> {j * PHASH_BAND_BITS}) & {mask} AS band_val FROM fp"
        for j in range(PHASH_BANDS)
    )
    return f"""
WITH bytes AS (
  SELECT doc_id AS media_id,
         CAST((u.i - 1) % {PHASH_CELLS} AS INT) AS cell,
         ascii(substr(text, CAST(u.i AS INT), 1)) AS v
  FROM documents, UNNEST(range(1, strlen(text) + 1)) AS u(i)
),
cells AS (
  SELECT media_id, cell, CAST(SUM(v) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM bytes GROUP BY media_id, cell
),
bits AS (
  SELECT c0.media_id, c0.cell AS c,
         CASE WHEN c1.s * c0.n > c0.s * c1.n THEN 1 ELSE 0 END AS bit
  FROM cells c0 JOIN cells c1
    ON c0.media_id = c1.media_id AND c1.cell = c0.cell + 1
),
fp AS (
  SELECT media_id,
         CAST(COALESCE(SUM(CAST(bit AS BIGINT) << c), 0) AS BIGINT) AS phash
  FROM bits GROUP BY media_id
),
bands AS ({bands_sel}),
sizes AS (
  SELECT band_idx, band_val FROM bands
  GROUP BY band_idx, band_val
  HAVING COUNT(*) <= {MAX_MEDIA_PER_PHASH_BAND}
),
capped AS (
  SELECT b.* FROM bands b JOIN sizes s
    ON b.band_idx = s.band_idx AND b.band_val = s.band_val
),
cand AS (
  SELECT a.media_id AS media_a, b.media_id AS media_b,
         a.phash AS h_a, b.phash AS h_b,
         CAST(COUNT(DISTINCT a.band_idx) AS BIGINT) AS n_bands
  FROM capped a JOIN capped b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.media_id < b.media_id
  GROUP BY 1, 2, 3, 4
)
SELECT media_a, media_b,
       CAST(bit_count(xor(h_a, h_b)) AS INT) AS hamming, n_bands
FROM cand
WHERE bit_count(xor(h_a, h_b)) <= {PHASH_MAX_HAMMING}
ORDER BY media_a, media_b
"""
