"""Multimodal columns (SURVEY.md §2.6, [EXT]): image/audio/video as
opaque ``binary`` columns + typed metadata structs, with decode /
feature-extraction / resize / frame-sampling as Arrow-batched
``mapInPandas`` operators.

The Spark-side plumbing is real and tested — schema, partition-safe UDF
signature, per-batch iteration, nested metadata — but the *codec* step
is a clearly-marked deterministic stub (`_fake_decode`): the container
has no image/audio libraries. Swapping in a real decoder is a one
function change behind `try: import PIL`.

Scale notes: binary payloads ride in the same parquet row-group as
their metadata, so predicate pushdown on metadata (e.g. format, width)
prunes payload IO *before* any decode; mapInPandas streams
Arrow batches, never materializing a partition of raw bytes in one
Python object.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ex_aws_firehose_spark.registry import query
from ex_aws_firehose_spark.tables import load_table, spread

try:  # real codecs are absent in this environment; plumbing is library-agnostic
    import PIL.Image  # noqa: F401

    HAVE_IMAGE_CODEC = True
except ImportError:
    HAVE_IMAGE_CODEC = False


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → media table: ``media BINARY`` (deterministic fake
    payload: the utf-8 text bytes) + typed metadata struct — the schema
    a real ingest would produce from image/audio files."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("text").cast("binary").alias("media"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            (F.col("n_chars") % 64 + 16).cast("int").alias("width"),
            ((F.col("doc_id") * 7) % 64 + 16).cast("int").alias("height"),
            (F.col("doc_id") % 5 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _fake_decode(media: pd.Series) -> pd.DataFrame:
    """STUB decoder (deterministic): real image/audio libraries are not
    installed here. Emits byte-level statistics shaped like decoded
    features. Replace with PIL/torchaudio behind HAVE_IMAGE_CODEC."""
    lengths = media.map(len)
    sums = media.map(lambda b: sum(b))
    return pd.DataFrame(
        {
            "n_bytes": lengths.astype("int64"),
            "mean_byte": (sums / lengths.replace(0, 1)).astype("float64"),
        }
    )


def decode_features(media_df: DataFrame) -> DataFrame:
    """Per-batch decode + feature extraction via mapInPandas. Output
    schema is fixed and typed; batches stream through Arrow."""
    schema = (
        "doc_id long, width int, height int, n_frames int, "
        "n_bytes long, mean_byte double"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _fake_decode(pdf["media"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": pdf["width"].values,
                    "height": pdf["height"].values,
                    "n_frames": pdf["n_frames"].values,
                    "n_bytes": feats["n_bytes"].values,
                    "mean_byte": feats["mean_byte"].values,
                }
            )

    flat = media_df.select(
        "doc_id", "media", "meta.width", "meta.height", "meta.n_frames"
    )
    return flat.mapInPandas(op, schema)


def sample_frames(media_df: DataFrame, stride: int = 2) -> DataFrame:
    """Frame-sampling plan surface: one output row per sampled frame
    index (every ``stride``-th frame). Pure Catalyst — the per-frame
    payload decode would plug into decode_features downstream."""
    return media_df.select(
        "doc_id",
        F.col("meta.n_frames").alias("n_frames"),
        F.explode(
            F.filter(
                F.sequence(F.lit(0), F.col("meta.n_frames") - 1),
                lambda i: i % stride == 0,
            )
        ).alias("frame_idx"),
    )


@query(
    "q_multimodal_binary",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           'fake/raw' AS format,
           CAST(n_chars % 64 + 16 AS INTEGER) AS width,
           CAST((doc_id * 7) % 64 + 16 AS INTEGER) AS height
    FROM documents
    """,
    tags=("llm", "multimodal"),
)
def q_multimodal_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column round-trip: payload byte length + metadata
    projection (the pushdown-able columns a scan would filter on)."""
    m = synth_media(spark, sf_dir)
    return m.select(
        "doc_id",
        F.octet_length("media").alias("n_bytes"),
        F.col("meta.format").alias("format"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


@query(
    "q_multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(doc_id % 5 + 1 AS INTEGER) AS n_frames,
           CAST(unnest(list_filter(range(0, CAST(doc_id % 5 + 1 AS INTEGER)),
                                   i -> i % 2 = 0)) AS INTEGER) AS frame_idx
    FROM documents
    """,
    tags=("llm", "multimodal"),
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: explode every 2nd frame index from
    the metadata frame count."""
    return sample_frames(synth_media(spark, sf_dir), stride=2).select(
        "doc_id", "n_frames", F.col("frame_idx").cast("int").alias("frame_idx")
    )


RESIZE_TARGET = 32


def resize_media(media_df: DataFrame, target: int = RESIZE_TARGET) -> DataFrame:
    """Resize plan surface via mapInPandas: scale every media payload to
    ``target``×``target``. The pixel resample is the stubbed step (the
    fake payload is truncated/padded to the scaled byte budget —
    deterministic); the Arrow batching, typed output schema, and
    metadata recompute are the real scale path a PIL/ffmpeg resampler
    would plug into."""
    schema = (
        "doc_id long, width int, height int, out_width int, out_height int, "
        "out_bytes binary, out_n_bytes long"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # STUB resample: byte budget scales with target area vs
            # source area; real codec would decode → resample → encode.
            budget = (
                pdf["media"].map(len) * (target * target)
                // (pdf["width"] * pdf["height"])
            ).astype("int64")
            out = [
                (m * (b // max(len(m), 1) + 1))[:b] if len(m) else b""
                for m, b in zip(pdf["media"], budget)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": pdf["width"].values,
                    "height": pdf["height"].values,
                    "out_width": target,
                    "out_height": target,
                    "out_bytes": out,
                    "out_n_bytes": [len(o) for o in out],
                }
            )

    flat = media_df.select("doc_id", "media", "meta.width", "meta.height")
    return flat.mapInPandas(op, schema)


@query(
    "q_multimodal_resize",
    oracle=f"""
    SELECT doc_id,
           CAST(n_chars % 64 + 16 AS INTEGER) AS width,
           CAST((doc_id * 7) % 64 + 16 AS INTEGER) AS height,
           {RESIZE_TARGET} AS out_width, {RESIZE_TARGET} AS out_height,
           CAST(octet_length(encode(text)) * {RESIZE_TARGET * RESIZE_TARGET}
                // ((n_chars % 64 + 16) * ((doc_id * 7) % 64 + 16))
                AS BIGINT) AS out_n_bytes
    FROM documents
    """,
    tags=("llm", "multimodal"),
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize through mapInPandas: output dims pinned to the target,
    byte budget scaled by target/source area. The metadata math is
    oracle-checked; the payload itself is exercised by the rows-only
    decode query."""
    return resize_media(synth_media(spark, sf_dir)).drop("out_bytes")


@query(
    "q_multimodal_decode",
    oracle="""
    -- _fake_decode is deterministic over the utf-8 text bytes: the
    -- media payload IS encode(text) (synth_media), text is pure ASCII
    -- (octet_length==length over all SFs), so per-byte sum == sum of
    -- per-char codepoints. mean_byte recomputed as the same int64/int64
    -- double division (correctly rounded in both engines → bit-equal).
    SELECT doc_id,
           CAST(n_chars % 64 + 16 AS INTEGER) AS width,
           CAST((doc_id * 7) % 64 + 16 AS INTEGER) AS height,
           CAST(doc_id % 5 + 1 AS INTEGER) AS n_frames,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(list_sum(list_transform(string_split(text, ''),
                                        c -> ascii(c))) AS DOUBLE)
             / GREATEST(octet_length(encode(text)), 1) AS mean_byte
    FROM documents
    """,
    tags=("llm", "multimodal"),
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature extraction through mapInPandas. The decode
    internals are a stub (`_fake_decode` — byte-level statistics), but
    deterministic, so the features are oracle-hash-verified end to end;
    the dataflow, schema and Arrow batching are the real scale path."""
    return decode_features(synth_media(spark, sf_dir))


@query(
    "q_multimodal_dedup",
    oracle="""
    WITH hashed AS (
        -- media bytes are the utf-8 encoding of text (synth_media);
        -- DuckDB's sha256 hashes the same utf-8 bytes from VARCHAR
        SELECT doc_id, source, sha256(text) AS h,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    )
    SELECT h AS content_sha, CAST(COUNT(*) AS BIGINT) AS n_copies,
           MIN(doc_id) AS keeper_doc,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
    FROM hashed GROUP BY h HAVING COUNT(*) > 1
    """,
    tags=("multimodal",),
)
def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-content dedup by checksum — the first pass every media
    corpus runs (identical bytes → one keeper, count the copies).
    sha2 runs JVM-side over the binary column at scan speed; the only
    shuffle carries (hash, doc_id, n_bytes) — never the payload bytes —
    which at 100 TB of media is the difference between shuffling
    32-byte digests and shuffling the corpus itself."""
    m = synth_media(spark, sf_dir)
    hashed = m.select(
        "doc_id",
        F.sha2("media", 256).alias("content_sha"),
        F.length("media").alias("n_bytes"),
    )
    return (
        hashed.groupBy("content_sha")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keeper_doc"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
        )
        .filter(F.col("n_copies") > 1)
    )


PHASH_BLOCKS = 32  # block-mean bits in the perceptual signature
PHASH_PREFIX_SHIFT = 16  # candidate bucket = high 16 bits
PHASH_MAX_HAMMING = 4
PHASH_MIN_BYTES = 64  # every block must be non-empty


def _phash_oracle() -> str:
    B, S, H, MN = (
        PHASH_BLOCKS,
        PHASH_PREFIX_SHIFT,
        PHASH_MAX_HAMMING,
        PHASH_MIN_BYTES,
    )
    return f"""
    WITH m AS (
        SELECT doc_id, text AS t, LENGTH(text) AS n,
               CAST(list_sum(list_transform(str_split(text, ''),
                    c -> ascii(c))) AS BIGINT) AS total
        FROM documents WHERE LENGTH(text) >= {MN}
    ),
    sig AS (
        SELECT doc_id,
           CAST(list_sum(list_transform(range(0, {B}), j ->
             CASE WHEN
               coalesce(list_sum(list_transform(
                   str_split(substr(t, (j*n)//{B} + 1,
                             ((j+1)*n)//{B} - (j*n)//{B}), ''),
                   c -> ascii(c))), 0) * n
               > total * (((j+1)*n)//{B} - (j*n)//{B})
             THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS BIGINT) AS phash
        FROM m
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b
      ON (a.phash >> {S}) = (b.phash >> {S}) AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.phash, b.phash)) <= {H}
    """


@query(
    "q_multimodal_phash",
    oracle=_phash_oracle(),
    tags=("llm", "multimodal", "dedup"),
)
def q_multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash NEAR-dup for binary media — the tolerant second
    pass after q_multimodal_dedup's exact checksum (block-mean-value
    perceptual hashing: a resize/re-encode shifts bytes but barely
    moves per-block means): the payload splits into 32 equal byte
    blocks, bit j = block-j mean above the whole-payload mean (exact
    integer cross-multiplication, no division), candidates bucket on
    the signature's high 16 bits and confirm at Hamming ≤ 4. On a real
    corpus the byte stream is the DECODED luma plane (the mapInPandas
    decode feeds this same shape); here it is the deterministic fake
    payload, which keeps the oracle able to reproduce every bit.

    100 TB shape: the signature is one Arrow-batched numpy pass over
    payload bytes (byte-plane arithmetic is the BLAS domain, like
    q_embed_top_pc — a per-char Catalyst HOF fold measured ~40× slower
    at sf0.1: 19.8 s vs sub-second) producing only (doc_id, 8-byte
    sig) rows; media bytes never shuffle. Candidates come from the
    same prefix-bucket self-join as SimHash with the same capacity
    dial (SCALE.md §15: signature/prefix width must grow with log n to
    hold bucket occupancy flat)."""
    B, S, H, MN = (
        PHASH_BLOCKS,
        PHASH_PREFIX_SHIFT,
        PHASH_MAX_HAMMING,
        PHASH_MIN_BYTES,
    )
    src = synth_media(spark, sf_dir).select("doc_id", "media").filter(
        F.length("media") >= MN
    )

    def compute_sig(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        weights = 1 << np.arange(B, dtype=np.int64)
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                codes = np.frombuffer(payload, dtype=np.uint8).astype(
                    np.int64
                )
                n = codes.shape[0]
                total = int(codes.sum())
                bounds = [(j * n) // B for j in range(B)]
                # reduceat needs strictly increasing bounds: n >= 2*B
                bsums = np.add.reduceat(codes, bounds)
                blens = np.diff(np.asarray(bounds + [n], dtype=np.int64))
                bits = (bsums * n) > (total * blens)
                ids.append(doc_id)
                hashes.append(int(bits.astype(np.int64) @ weights))
            yield pd.DataFrame({"doc_id": ids, "phash": hashes})

    sig = src.mapInPandas(compute_sig, "doc_id long, phash long")
    a, b = sig.alias("a"), sig.alias("b")
    hamming = F.bit_count(F.expr("a.phash ^ b.phash"))
    return (
        a.join(
            b,
            (
                F.expr(f"shiftright(a.phash, {S})")
                == F.expr(f"shiftright(b.phash, {S})")
            )
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(hamming <= H)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
    )


AUDIO_CHUNK_BYTES = 256


@query(
    "q_multimodal_audio_chunk",
    oracle=f"""
    WITH media AS (
        -- documents text is pure ASCII (verified octet_length==length),
        -- so VARCHAR slicing is byte slicing; encode() after the slice
        SELECT doc_id, text AS m, octet_length(encode(text)) AS n
        FROM documents
    ),
    chunks AS (
        SELECT doc_id, n,
               unnest(range(0, CAST(CEIL(n / {AUDIO_CHUNK_BYTES}.0)
                                    AS BIGINT))) AS chunk_id
        FROM media
    )
    SELECT c.doc_id, CAST(c.chunk_id AS BIGINT) AS chunk_id,
           CAST(c.chunk_id * {AUDIO_CHUNK_BYTES} AS BIGINT) AS byte_off,
           CAST(LEAST(CAST({AUDIO_CHUNK_BYTES} AS BIGINT),
                      c.n - c.chunk_id * {AUDIO_CHUNK_BYTES}) AS INTEGER)
               AS chunk_len,
           sha256(substring(m.m,
                            CAST(c.chunk_id * {AUDIO_CHUNK_BYTES} + 1
                                 AS INTEGER),
                            {AUDIO_CHUNK_BYTES})) AS chunk_sha
    FROM chunks c JOIN media m USING (doc_id)
    """,
    tags=("multimodal",),
)
def q_multimodal_audio_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waveform-style chunking: opaque media bytes split into fixed
    256-byte windows (one row per chunk with offset/length/sha-256) —
    the segmentation pass an audio pipeline runs before feature
    extraction, with per-chunk checksums proving the byte slicing is
    faithful. Pure Catalyst: sequence+explode fans out chunk ids,
    substring slices the binary JVM-side — no Python touches the
    payload. At 100 TB the chunk rows carry (doc_id, offset, sha),
    32-byte digests, while the original blob column stays unexploded —
    slicing is recomputed where needed rather than shuffling N copies
    of the corpus."""
    m = synth_media(spark, sf_dir).select(
        "doc_id", "media", F.length("media").alias("n")
    )
    n_chunks = F.ceil(F.col("n") / float(AUDIO_CHUNK_BYTES)).cast("long")
    # Zero-length media must yield zero chunks. Without the guard,
    # sequence(0, -1) defaults to step -1 and emits [0, -1] — two
    # spurious rows the DuckDB oracle's empty range(0, 0) never has.
    chunks = m.filter(n_chunks > 0).select(
        "doc_id",
        "media",
        "n",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_id"
        ),
    )
    off = F.col("chunk_id") * AUDIO_CHUNK_BYTES
    return chunks.select(
        "doc_id",
        "chunk_id",
        off.alias("byte_off"),
        F.least(
            F.lit(AUDIO_CHUNK_BYTES).cast("long"), F.col("n") - off
        ).cast("int").alias("chunk_len"),
        F.sha2(
            F.expr(
                f"substring(media, CAST(chunk_id * {AUDIO_CHUNK_BYTES} + 1"
                " AS INT), "
                f"{AUDIO_CHUNK_BYTES})"
            ),
            256,
        ).alias("chunk_sha"),
    )


PATCH_PX = 8  # patch geometry (pixels)
PATCH_BYTES = 64  # fake-raster bytes per patch (stub payload mapping)


@query(
    "q_multimodal_image_patch",
    oracle=f"""
    WITH media AS (
        SELECT doc_id, text AS m, octet_length(encode(text)) AS n,
               CAST(n_chars % 64 + 16 AS INTEGER) AS width,
               CAST((doc_id * 7) % 64 + 16 AS INTEGER) AS height
        FROM documents
    ),
    rows_ AS (
        SELECT doc_id, m, n, width, height,
               unnest(range(0, CAST(CEIL(height / {PATCH_PX}.0) AS BIGINT)))
                   AS prow
        FROM media
    ),
    grid AS (
        SELECT doc_id, m, n, width, height, prow,
               unnest(range(0, CAST(CEIL(width / {PATCH_PX}.0) AS BIGINT)))
                   AS pcol,
               CAST(CEIL(width / {PATCH_PX}.0) AS BIGINT) AS pcols
        FROM rows_
    )
    SELECT doc_id, CAST(prow AS BIGINT) AS prow, CAST(pcol AS BIGINT) AS pcol,
           CAST(pcol * {PATCH_PX} AS INTEGER) AS x0,
           CAST(prow * {PATCH_PX} AS INTEGER) AS y0,
           CAST(LEAST({PATCH_PX}, width - pcol * {PATCH_PX}) AS INTEGER) AS pw,
           CAST(LEAST({PATCH_PX}, height - prow * {PATCH_PX}) AS INTEGER) AS ph,
           CASE WHEN (prow * pcols + pcol) * {PATCH_BYTES} < n
                THEN sha256(substring(m,
                        CAST((prow * pcols + pcol) * {PATCH_BYTES} + 1 AS INTEGER),
                        {PATCH_BYTES}))
                ELSE NULL END AS patch_sha
    FROM grid
    """,
    tags=("multimodal",),
)
def q_multimodal_image_patch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vision-transformer-style patch grid: each media object fans out
    to a 2-D grid of 8×8-pixel patches from its metadata geometry
    (row × col double explode), with edge patches clamped to the image
    bounds — the patch-sequence layout every ViT-style preprocessor
    emits. Patch payloads map into the (stub) fake raster at
    64 bytes/patch with per-patch sha-256 where the byte window exists;
    a real decoder would slice the decoded raster instead — the
    Spark-side plumbing (nested 2-D fan-out, clamped geometry, keyed
    byte windows) is what carries.

    100 TB shape: geometry explodes from metadata only — the media
    column itself never fans out (each patch row carries doc_id +
    coordinates + a 32-byte digest, not payload copies); the double
    sequence/explode is whole-stage codegen, zero Python, zero
    shuffle."""
    m = synth_media(spark, sf_dir).select(
        "doc_id",
        "media",
        F.length("media").alias("n"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    pr = F.ceil(F.col("height") / float(PATCH_PX)).cast("long")
    pc = F.ceil(F.col("width") / float(PATCH_PX)).cast("long")
    grid = m.withColumn("pcols", pc).select(
        "doc_id",
        "media",
        "n",
        "width",
        "height",
        "pcols",
        F.explode(F.sequence(F.lit(0).cast("long"), pr - 1)).alias("prow"),
    ).select(
        "*",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("pcols") - 1)).alias(
            "pcol"
        ),
    )
    off = (F.col("prow") * F.col("pcols") + F.col("pcol")) * PATCH_BYTES
    return grid.select(
        "doc_id",
        "prow",
        "pcol",
        (F.col("pcol") * PATCH_PX).cast("int").alias("x0"),
        (F.col("prow") * PATCH_PX).cast("int").alias("y0"),
        F.least(F.lit(PATCH_PX), F.col("width") - F.col("pcol") * PATCH_PX)
        .cast("int")
        .alias("pw"),
        F.least(F.lit(PATCH_PX), F.col("height") - F.col("prow") * PATCH_PX)
        .cast("int")
        .alias("ph"),
        F.when(
            off < F.col("n"),
            F.sha2(
                F.expr(
                    f"substring(media, CAST((prow * pcols + pcol) * {PATCH_BYTES} + 1 AS INT), {PATCH_BYTES})"
                ),
                256,
            ),
        ).alias("patch_sha"),
    )


@query(
    "q_multimodal_pair_audit",
    oracle="""
    WITH d AS (SELECT doc_id, source FROM documents),
    e AS (SELECT vec_id FROM embeddings),
    e_sim AS (SELECT vec_id FROM e WHERE vec_id % 37 <> 0),
    j AS (
        SELECT d.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_paired
        FROM d LEFT JOIN e ON e.vec_id = d.doc_id
        GROUP BY d.source
    ),
    jsim AS (
        SELECT d.source,
               CAST(SUM(CASE WHEN s.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_paired_sim
        FROM d LEFT JOIN e_sim s ON s.vec_id = d.doc_id
        GROUP BY d.source
    ),
    orphan_vecs AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM e WHERE NOT EXISTS (SELECT 1 FROM d WHERE d.doc_id = e.vec_id)
    ),
    orphan_canary AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM e WHERE NOT EXISTS (SELECT 1 FROM d
                                 WHERE d.doc_id = e.vec_id
                                   AND d.doc_id % 100 <> 0)
    )
    SELECT j.source, j.n_docs, j.n_paired,
           CAST(j.n_paired * 1000000 // j.n_docs AS BIGINT)
               AS coverage_ppm,
           js.n_paired_sim,
           CAST(js.n_paired_sim * 1000000 // j.n_docs AS BIGINT)
               AS coverage_sim_ppm,
           o.n AS n_orphan_vectors,
           oc.n AS n_orphan_vectors_canary
    FROM j JOIN jsim js USING (source)
    CROSS JOIN orphan_vecs o CROSS JOIN orphan_canary oc
    """,
    tags=("multimodal", "dq"),
)
def q_multimodal_pair_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-table integrity audit for multimodal training data (the
    check a CLIP-style contrastive pipeline runs before building
    batches): per source, how many documents have a paired embedding
    (vec_id = doc_id), exact-ppm coverage, plus the global count of
    orphan vectors pointing at no document. Broken pairing silently
    poisons contrastive batches — this is the gate.

    100 TB shape: one LEFT join on the id (both sides pruned to the
    key column; the smaller side broadcasts or co-partitions), one
    ~|sources| agg, and an anti-join count for orphans — the same
    q_dq_referential_orphans shape specialized to the pair table. At
    scale the pair table is maintained incrementally, and this audit
    runs per delta partition."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    e = load_table(spark, sf_dir, "embeddings").select("vec_id")
    # The fixture pair table is PERFECT (1:1, zero orphans at every
    # SF), so alongside the observed columns the audit carries two
    # deterministic fault simulations — a 1-in-37-dropped embedding
    # delta (partial pair-table refresh) and a 1%-dropped document
    # dimension (the orphan-vector fault) — validating the non-trivial
    # arms of both metrics cross-engine.
    e_sim = e.filter(F.col("vec_id") % 37 != 0)
    j = (
        d.join(e, d.doc_id == e.vec_id, "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.when(F.col("vec_id").isNotNull(), 1).otherwise(0)
            ).alias("n_paired"),
        )
    )
    jsim = (
        d.join(e_sim, d.doc_id == e_sim.vec_id, "left")
        .groupBy("source")
        .agg(
            F.sum(
                F.when(F.col("vec_id").isNotNull(), 1).otherwise(0)
            ).alias("n_paired_sim"),
        )
    )
    orphans = F.broadcast(
        e.join(d, e.vec_id == d.doc_id, "left_anti").agg(
            F.count("*").alias("n_orphan_vectors")
        )
    )
    d_canary = d.filter(F.col("doc_id") % 100 != 0)
    orphans_canary = F.broadcast(
        e.join(d_canary, e.vec_id == d_canary.doc_id, "left_anti").agg(
            F.count("*").alias("n_orphan_vectors_canary")
        )
    )
    return (
        j.join(jsim, "source")
        .crossJoin(orphans)
        .crossJoin(orphans_canary)
        .select(
            "source",
            "n_docs",
            "n_paired",
            F.expr("n_paired * 1000000 div n_docs").alias("coverage_ppm"),
            "n_paired_sim",
            F.expr("n_paired_sim * 1000000 div n_docs").alias(
                "coverage_sim_ppm"
            ),
            "n_orphan_vectors",
            "n_orphan_vectors_canary",
        )
    )


WDS_SHARD_CAP = 4096  # bytes per webdataset-style shard (synthetic scale)


@query(
    "q_multimodal_shard_webdataset",
    oracle=f"""
    WITH m AS (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS nbytes
        FROM documents
    ),
    c AS (
        SELECT doc_id, nbytes,
               SUM(nbytes) OVER (ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM m
    ),
    s AS (
        SELECT doc_id, nbytes,
               CAST((cum - 1) // {WDS_SHARD_CAP} AS BIGINT) AS shard
        FROM c
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(nbytes) AS BIGINT) AS shard_bytes,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM s GROUP BY shard
    """,
    tags=("multimodal", "curation"),
)
def q_multimodal_shard_webdataset(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WebDataset-style SHARD PLANNING for multimodal blobs: samples
    pack into size-capped tar-like shards in a stable key order
    (running byte total div cap — sequential packing, the layout
    streaming dataloaders need for contiguous reads), reported per
    shard with sample count, byte total, and the doc-id range that
    names the shard. Contrast with q_shard_balanced's round-robin LPT:
    that optimizes byte BALANCE, this optimizes sequential LOCALITY —
    the two layouts a training job chooses between.

    Shape: the running total is one global-ordered window — a sampled
    range exchange, same as any global sort; at 100 TB the order key
    is already the ingest sort, so the cumsum folds into the write
    pass. Everything downstream is one hash agg on shard id."""
    media = synth_media(spark, sf_dir)
    sized = media.select(
        "doc_id", F.length("media").cast("long").alias("nbytes")
    )
    from pyspark.sql import Window as W

    cum = sized.withColumn(
        "cum",
        F.sum("nbytes").over(
            W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    shards = cum.select(
        "doc_id",
        "nbytes",
        F.expr(f"CAST((cum - 1) DIV {WDS_SHARD_CAP} AS LONG)").alias("shard"),
    )
    return shards.groupBy("shard").agg(
        F.count("*").alias("n_samples"),
        F.sum("nbytes").alias("shard_bytes"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )
