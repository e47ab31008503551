"""Multimodal columns — SURVEY.md §2B LLM ops.

Image/audio/video payloads are opaque ``binary`` columns plus typed
metadata (struct/map), exactly how a 100 TB multimodal lakehouse
stores them: parquet keeps blobs inline (or as object-store pointers),
metadata columns drive pruning, and Python touches bytes only inside
Arrow-batched ``mapInPandas`` kernels.

The container has no image/audio codecs, so the decode step is a
deterministic fake (`_fake_decode`) with the real path stubbed behind
``NotImplementedError`` — the Spark-side plumbing (binary schema,
metadata derivation, mapInPandas batch shape, frame explode) is real
and oracle-checked: the fake features are pure functions of the bytes
that DuckDB can recompute.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_task_spark.registry import register
from hive_task_spark.tables import load

#: flip to route _decode_batch to a real codec (not available here).
USE_REAL_DECODER = False


def _assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fabricate a multimodal asset table from `documents`: the utf-8
    bytes of `text` stand in for an encoded payload; typed metadata
    (modality, width, height, sample_rate) derives deterministically
    from doc_id so both engines can rebuild it.

    ASCII-only corpus invariant: several oracles in this module
    (decode_features' unicode(c) checksum, scene_cuts' ascii(substr)
    frame means) index `text` by CHARACTER while the Spark kernels
    slice raw UTF-8 BYTES — identical only when every document is
    pure ASCII (octet_length == char length).  The driver-generated
    corpus satisfies this; tests/test_properties.py::
    test_documents_corpus_is_pure_ascii pins it per SF so a corpus
    change fails loudly there instead of desyncing frame boundaries
    silently."""
    d = load(spark, sf_dir, "documents")
    modality = F.element_at(
        F.lit(["image", "audio", "video"]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            modality.alias("modality"),
            (64 + F.col("doc_id") % 448).cast("int").alias("width"),
            (64 + (F.col("doc_id") * 7) % 448).cast("int").alias("height"),
            (8000 + (F.col("doc_id") % 5) * 8000).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


@register(
    "multimodal_metadata_profile",
    oracle="""
    SELECT
        ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS modality,
        CAST(count(*) AS BIGINT)                      AS n_assets,
        CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        avg(64 + doc_id % 448)                        AS avg_width,
        CAST(max(8000 + (doc_id % 5) * 8000) AS INT)  AS max_sample_rate
    FROM documents
    GROUP BY 1
    """,
)
def multimodal_metadata_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-modality storage profile over the typed metadata — the
    pruning/statistics layer of a multimodal table (no byte access:
    at 100 TB this query never reads the blob column — column pruning
    keeps it out of the scan entirely)."""
    a = _assets(spark, sf_dir)
    return a.groupBy(F.col("meta.modality").alias("modality")).agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.length("payload")).cast("long").alias("total_bytes"),
        F.avg("meta.width").alias("avg_width"),
        F.max("meta.sample_rate").alias("max_sample_rate"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a codec: (n_bytes, checksum32).

    checksum32 = byte sum folded mod 2^31-1 — recomputable in SQL."""
    return len(payload), sum(payload) % 2147483647


def _decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow batches in, decoded features out.
    This is the real 100 TB plumbing — swap `_fake_decode` for a codec
    and the plan does not change."""
    if USE_REAL_DECODER:
        raise NotImplementedError(
            "real image/audio decoding requires codec libraries not "
            "present in this environment (PIL/torchaudio/ffmpeg)"
        )
    for pdf in it:
        feats = pdf["payload"].map(_fake_decode)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "n_bytes": feats.map(lambda t: t[0]),
                "checksum32": feats.map(lambda t: t[1]),
            }
        )


@register(
    "multimodal_decode_features",
    oracle="""
    SELECT
        doc_id,
        ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS modality,
        CAST(octet_length(encode(text)) AS BIGINT)               AS n_bytes,
        CAST(list_sum(list_transform(string_split(text, ''), c -> unicode(c)))
             % 2147483647 AS BIGINT)                             AS checksum32
    FROM documents
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract via ``mapInPandas`` over binary payloads.
    The fake decoder's features (length + byte-sum checksum) are
    recomputed bit-by-bit in the oracle, so the whole Python batch path
    — schema, Arrow transfer, kernel — is value-checked."""
    a = _assets(spark, sf_dir)
    narrow = a.select("doc_id", F.col("meta.modality").alias("modality"), "payload")
    return narrow.mapInPandas(
        _decode_batch,
        "doc_id long, modality string, n_bytes long, checksum32 long",
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH v AS (
        SELECT doc_id, octet_length(encode(text)) // 64 AS n_frames
        FROM documents
        WHERE doc_id % 3 + 1 = 3  -- video modality
    )
    SELECT
        doc_id,
        CAST(unnest(range(0, n_frames, 8)) AS BIGINT) AS frame_idx,
        CAST(unnest(range(0, n_frames, 8)) * 64 AS BIGINT) AS byte_offset
    FROM v
    WHERE n_frames > 0
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for 'video' assets: 64-byte pseudo-frames, every
    8th sampled — explode(sequence) generates the sample plan without
    touching payload bytes (the fetch would be a later mapInPandas)."""
    a = _assets(spark, sf_dir)
    v = a.filter(F.col("meta.modality") == "video").select(
        "doc_id", (F.length("payload") / 64).cast("long").alias("n_frames")
    )
    return (
        v.filter(F.col("n_frames") > 0)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(8))
            ).alias("frame_idx"),
        )
        .select(
            "doc_id",
            F.col("frame_idx").cast("long").alias("frame_idx"),
            (F.col("frame_idx") * 64).cast("long").alias("byte_offset"),
        )
    )


@register(
    "multimodal_resize_plan",
    oracle="""
    SELECT
        doc_id,
        64 + doc_id % 448                                   AS width,
        64 + (doc_id * 7) % 448                             AS height,
        CAST(floor(least(256.0 / (64 + doc_id % 448),
                         256.0 / (64 + (doc_id * 7) % 448)) *
                   (64 + doc_id % 448)) AS INT)             AS out_width,
        CAST(floor(least(256.0 / (64 + doc_id % 448),
                         256.0 / (64 + (doc_id * 7) % 448)) *
                   (64 + (doc_id * 7) % 448)) AS INT)       AS out_height
    FROM documents
    WHERE doc_id % 3 + 1 = 1  -- image modality
    """,
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning for 'image' assets: aspect-preserving fit into
    256×256 computed from metadata only. The pixel transform itself
    would run in `_decode_batch`-style kernels; the geometry (what a
    preprocessing pipeline shuffles on and batches by) is the plan."""
    a = _assets(spark, sf_dir)
    img = a.filter(F.col("meta.modality") == "image").select(
        "doc_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    scale = F.least(
        F.lit(256.0) / F.col("width"), F.lit(256.0) / F.col("height")
    )
    # floor (not cast) on both engines: DuckDB CAST(double AS INT)
    # rounds while Spark truncates — floor over identical IEEE doubles
    # is the only portable integerization.
    return img.select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.floor(scale * F.col("width")).cast("int").alias("out_width"),
        F.floor(scale * F.col("height")).cast("int").alias("out_height"),
    )


def _audio_window_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel with 1:N row shape: each audio payload emits
    one row PER 32-byte analysis window (rows out != rows in — the
    batch shape a scalar UDF cannot produce). Swap the uint8 view for
    a real PCM decode and the plan is unchanged."""
    import numpy as np

    if USE_REAL_DECODER:
        raise NotImplementedError(
            "real audio decoding requires torchaudio/ffmpeg, absent here"
        )
    for pdf in it:
        rows: dict[str, list] = {
            "doc_id": [], "win_idx": [], "mean_amp": [], "peak_amp": []
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(bytes(payload), dtype=np.uint8)
            for w in range(len(arr) // 32):
                win = arr[w * 32 : (w + 1) * 32]
                rows["doc_id"].append(doc_id)
                rows["win_idx"].append(w)
                rows["mean_amp"].append(float(win.mean()))
                rows["peak_amp"].append(int(win.max()))
        yield pd.DataFrame(rows).astype(
            {"doc_id": "int64", "win_idx": "int64",
             "mean_amp": "float64", "peak_amp": "int64"}
        )


@register(
    "multimodal_audio_windows",
    oracle="""
    WITH a AS (
        SELECT doc_id,
               list_transform(string_split(text, ''), c -> unicode(c)) AS s
        FROM documents
        WHERE doc_id % 3 + 1 = 2  -- audio modality
    ),
    w AS (
        SELECT doc_id, s, unnest(range(0, len(s) // 32)) AS win_idx
        FROM a WHERE len(s) >= 32
    )
    SELECT doc_id,
           CAST(win_idx AS BIGINT)                                    AS win_idx,
           CAST(list_avg(s[win_idx * 32 + 1 : win_idx * 32 + 32]) AS DOUBLE)
                                                                      AS mean_amp,
           CAST(list_max(s[win_idx * 32 + 1 : win_idx * 32 + 32]) AS BIGINT)
                                                                      AS peak_amp
    FROM w
    """,
)
def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio feature extraction: 32-byte pseudo-PCM analysis
    windows per 'audio' asset, mean + peak amplitude per window, via a
    1:N ``mapInPandas`` kernel (one input asset → many window rows).
    The modality filter prunes BEFORE the Python stage so the kernel
    only receives audio blobs; window means are exact dyadic doubles
    (sum of ints / 32), bit-identical to the oracle's list_avg."""
    a = _assets(spark, sf_dir)
    audio = a.filter(F.col("meta.modality") == "audio").select("doc_id", "payload")
    return audio.mapInPandas(
        _audio_window_batches,
        "doc_id long, win_idx long, mean_amp double, peak_amp long",
    )


@register(
    "multimodal_shard_manifest",
    oracle="""
    WITH a AS (
        SELECT doc_id,
               ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)]
                   AS modality,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    ),
    c AS (
        SELECT modality, n_bytes,
               sum(n_bytes) OVER (
                   PARTITION BY modality
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM a
    )
    SELECT modality,
           CAST(floor((cum - n_bytes) / 65536.0) AS BIGINT) AS shard_id,
           CAST(count(*) AS BIGINT)                         AS n_assets,
           CAST(sum(n_bytes) AS BIGINT)                     AS shard_bytes
    FROM c
    GROUP BY modality, floor((cum - n_bytes) / 65536.0)
    """,
)
def multimodal_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Webdataset-style shard packing manifest: within each modality,
    assets are laid into ~64 KiB shards in md5(doc_id) order (ingest-
    order-free, rerun-stable) by a running byte total; shard id =
    closed-left bin of the bytes preceding the asset. The output is
    the manifest a downstream tar/arrow writer consumes. Metadata-
    only: the blob column is never read (column pruning) — sizes come
    from the typed metadata, which is the point at 100 TB. Per-
    modality windows keep the running sum partitioned (no global
    sort); a skewed modality splits under the same two-pass plan as
    the token-budget cutoff (SCALE.md)."""
    from pyspark.sql import Window

    a = _assets(spark, sf_dir)
    w = (
        Window.partitionBy(F.col("meta.modality"))
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = a.select(
        F.col("meta.modality").alias("modality"),
        F.length("payload").alias("n_bytes"),
        F.sum(F.length("payload")).over(w).alias("cum"),
    )
    return (
        c.groupBy(
            "modality",
            F.floor((F.col("cum") - F.col("n_bytes")) / 65536.0).alias(
                "shard_id"
            ),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_assets"),
            F.sum("n_bytes").cast("long").alias("shard_bytes"),
        )
        .select(
            "modality",
            F.col("shard_id").cast("long").alias("shard_id"),
            "n_assets",
            "shard_bytes",
        )
    )


@register(
    "multimodal_phash_neardup",
    oracle="""
    WITH sig AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS sig60
        FROM documents
    ),
    bands AS (
        SELECT doc_id, sig60, b.band_id,
               (sig60 >> (b.band_id * 15)) & 32767 AS band_key
        FROM sig CROSS JOIN
             (SELECT * FROM (VALUES (0), (1), (2), (3)) AS t(band_id)) b
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.sig60 AS sa, b.sig60 AS sb
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(sa, sb)) <= 20
    """,
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection for binary assets, the
    image-dedup architecture at lakehouse scale: a 60-bit signature
    per payload, split into 4×15-bit LSH bands; assets sharing any
    band collide into candidate pairs (equi-join — never all-pairs),
    then the exact Hamming distance over the full signature verifies
    (≤20 bits). The signature here is md5-derived from the payload
    bytes (the container has no image codecs — a real pHash/aHash
    drops into the same 60-bit slot via the mapInPandas decode
    kernel, multimodal.py header), which preserves every structural
    property of the pipeline: banding math, candidate generation,
    verify threshold, and the guarantee that identical payloads land
    at Hamming 0. Integer band keys keep the shuffle 8 bytes/row/band."""
    d = load(spark, sf_dir, "documents")
    sig = d.select(
        "doc_id",
        F.expr(
            "CAST(conv(substr(md5(text), 1, 15), 16, 10) AS BIGINT)"
        ).alias("sig60"),
    )
    bands_dim = F.broadcast(
        spark.createDataFrame([(0,), (1,), (2,), (3,)], "band_id int")
    )
    bands = sig.crossJoin(bands_dim).select(
        "doc_id",
        "sig60",
        "band_id",
        F.expr("shiftright(sig60, band_id * 15) & 32767").alias("band_key"),
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sig60").alias("sa"),
        "band_id",
        "band_key",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sig60").alias("sb"),
        "band_id",
        "band_key",
    )
    cand = (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sa", "sb")
        .distinct()
    )
    hamming = F.expr("bit_count(sa ^ sb)")
    return (
        cand.withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= 20)
        .select("doc_a", "doc_b", "hamming")
    )


@register(
    "multimodal_crossmodal_integrity",
    oracle="""
    WITH d AS (SELECT doc_id FROM documents),
    v AS (SELECT vec_id FROM embeddings),
    j AS (SELECT d.doc_id FROM d JOIN v ON d.doc_id = v.vec_id)
    SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_docs,
        (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_vectors,
        (SELECT CAST(count(*) AS BIGINT) FROM j) AS n_paired,
        (SELECT CAST(count(*) AS BIGINT) FROM d
         WHERE doc_id NOT IN (SELECT vec_id FROM v)) AS n_docs_unembedded,
        (SELECT CAST(count(*) AS BIGINT) FROM v
         WHERE vec_id NOT IN (SELECT doc_id FROM d)) AS n_orphan_vectors,
        round((SELECT count(*) FROM j)
              / (1.0 * (SELECT count(*) FROM d)), 6) AS coverage_r
    """,
)
def multimodal_crossmodal_integrity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-modal referential integrity: every document should have
    an embedding (doc_id ↔ vec_id) — the pairing audit a multimodal/
    RAG pipeline runs after each embedding batch, where unembedded
    docs mean retrieval blind spots and orphan vectors mean the index
    serves deleted content. Anti-joins give both orphan directions;
    at 100 TB each is a broadcastable-or-shuffled semi-join on the id
    (the same key both tables are naturally bucketed by), and the
    report is one row."""
    d = load(spark, sf_dir, "documents").select("doc_id")
    v = load(spark, sf_dir, "embeddings").select("vec_id")
    j = d.join(v, d["doc_id"] == v["vec_id"])
    n_docs = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    n_vecs = v.agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
    n_pair = j.agg(F.count(F.lit(1)).cast("long").alias("n_paired"))
    n_unemb = (
        d.join(v, d["doc_id"] == v["vec_id"], "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs_unembedded"))
    )
    n_orph = (
        v.join(d, d["doc_id"] == v["vec_id"], "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orphan_vectors"))
    )
    return (
        n_docs.crossJoin(F.broadcast(n_vecs))
        .crossJoin(F.broadcast(n_pair))
        .crossJoin(F.broadcast(n_unemb))
        .crossJoin(F.broadcast(n_orph))
        .select(
            "n_docs",
            "n_vectors",
            "n_paired",
            "n_docs_unembedded",
            "n_orphan_vectors",
            F.round(
                F.col("n_paired") / (F.lit(1.0) * F.col("n_docs")), 6
            ).alias("coverage_r"),
        )
    )


def _frame_feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one row per 64-byte pseudo-frame carrying
    its mean byte value — the stand-in for a per-frame embedding.
    Exactness note: each frame mean is sum(<=64 uint8)/64, a dyadic
    rational that float64 represents exactly, so the DuckDB twin
    (ascii() arithmetic over the same chars) reproduces it bit-for-bit.
    Swap the uint8 view for a real frame decode + feature net and the
    plan shape is unchanged."""
    import numpy as np

    if USE_REAL_DECODER:
        raise NotImplementedError(
            "real video decoding requires ffmpeg/torchvision, absent here"
        )
    for pdf in it:
        rows: dict[str, list] = {"doc_id": [], "frame_idx": [], "fmean": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(bytes(payload), dtype=np.uint8)
            n = len(arr) // 64
            # Vectorized windowing: reshape to (n_frames, 64) and mean
            # along axis 1 — the only per-row work left is the decode
            # stand-in itself (inherently per-item).
            means = arr[: n * 64].reshape(-1, 64).mean(axis=1, dtype=np.float64)
            rows["doc_id"].extend([doc_id] * n)
            rows["frame_idx"].extend(range(n))
            rows["fmean"].extend(means.tolist())
        yield pd.DataFrame(rows).astype(
            {"doc_id": "int64", "frame_idx": "int64", "fmean": "float64"}
        )


@register(
    "multimodal_scene_cuts",
    oracle="""
    WITH v AS (
        SELECT doc_id, text, octet_length(encode(text)) // 64 AS n_frames
        FROM documents
        WHERE doc_id % 3 + 1 = 3 AND octet_length(encode(text)) // 64 > 0
    ),
    w AS (
        SELECT doc_id, text, unnest(range(0, n_frames)) AS frame_idx FROM v
    ),
    f AS (
        SELECT doc_id, frame_idx,
               list_avg([ascii(substr(text, CAST(frame_idx * 64 + i AS INT), 1))
                         FOR i IN range(1, 65)]) AS fmean
        FROM w
    ),
    d AS (
        SELECT doc_id, frame_idx, fmean,
               abs(fmean - lag(fmean) OVER (
                   PARTITION BY doc_id ORDER BY frame_idx)) AS delta
        FROM f
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT)                          AS n_frames,
           CAST(coalesce(sum(CASE WHEN delta > 1.5 THEN 1 ELSE 0 END), 0)
                AS BIGINT)                                   AS n_cuts,
           CAST(coalesce(min(CASE WHEN delta > 1.5 THEN frame_idx END), -1)
                AS BIGINT)                                   AS first_cut_idx,
           round(coalesce(max(delta), 0.0), 6)               AS max_delta_r
    FROM d GROUP BY doc_id
    """,
)
def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over 'video' assets: per-frame features
    from an Arrow-batched mapInPandas kernel (mean byte value of each
    64-byte pseudo-frame — the deterministic stand-in for a frame
    embedding), then a per-video lag window marks a cut wherever the
    feature jumps by more than 1.5 between adjacent frames. Report
    per video: frame count, cut count, first cut position, and the
    largest inter-frame delta — the shot-boundary table a video
    training pipeline uses to pick clip boundaries.

    Scale shape: the kernel is a pure map stage (payload bytes never
    shuffle; rows out = frames, 1:N like the audio windows); the only
    shuffle is the per-video window + aggregate on doc_id. The frame
    means are dyadic rationals (sum(uint8)/64) so both engines agree
    bit-exactly and the 1.5 threshold can never sit on a boundary
    (deltas are multiples of 1/64)."""
    a = _assets(spark, sf_dir)
    video = a.filter(F.col("meta.modality") == "video").select("doc_id", "payload")
    frames = video.mapInPandas(
        _frame_feature_batches, "doc_id long, frame_idx long, fmean double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    d = frames.withColumn(
        "delta", F.abs(F.col("fmean") - F.lag("fmean").over(w))
    )
    cut = F.when(F.col("delta") > 1.5, 1).otherwise(0)
    return d.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.coalesce(F.sum(cut), F.lit(0)).cast("long").alias("n_cuts"),
        F.coalesce(
            F.min(F.when(F.col("delta") > 1.5, F.col("frame_idx"))), F.lit(-1)
        )
        .cast("long")
        .alias("first_cut_idx"),
        F.round(F.coalesce(F.max("delta"), F.lit(0.0)), 6).alias("max_delta_r"),
    )


@register(
    "multimodal_vad_segments",
    oracle="""
    WITH v AS (
        SELECT doc_id, text, octet_length(encode(text)) // 64 AS n_frames
        FROM documents
        WHERE doc_id % 3 + 1 = 2 AND octet_length(encode(text)) // 64 > 0
    ),
    w AS (
        SELECT doc_id, text, unnest(range(0, n_frames)) AS frame_idx FROM v
    ),
    f AS (
        SELECT doc_id, frame_idx,
               list_avg([ascii(substr(text, CAST(frame_idx * 64 + i AS INT), 1))
                         FOR i IN range(1, 65)]) AS fmean
        FROM w
    ),
    act AS (
        SELECT doc_id, frame_idx
        FROM (SELECT doc_id, frame_idx, fmean,
                     avg(fmean) OVER (PARTITION BY doc_id) AS doc_avg
              FROM f)
        WHERE fmean > doc_avg
    ),
    isl AS (
        SELECT doc_id, frame_idx,
               frame_idx - row_number() OVER (
                   PARTITION BY doc_id ORDER BY frame_idx) AS grp
        FROM act
    ),
    seg AS (
        SELECT doc_id, grp,
               min(frame_idx) AS seg_start,
               count(*) AS seg_len
        FROM isl GROUP BY doc_id, grp
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT)        AS n_segments,
           CAST(sum(seg_len) AS BIGINT)    AS n_active_frames,
           CAST(max(seg_len) AS BIGINT)    AS max_seg_len,
           CAST(min(seg_start) AS BIGINT)  AS first_seg_start
    FROM seg GROUP BY doc_id
    """,
)
def multimodal_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity-detection segmentation over 'audio' assets: the
    mapInPandas kernel emits one energy value per 64-byte pseudo-frame
    (mean byte value — the stand-in for RMS energy of a real PCM
    window), a frame is ACTIVE when its energy exceeds the asset's own
    mean energy (the classic adaptive-threshold VAD), and adjacent
    active frames merge into segments via the gaps-and-islands
    rewrite (frame_idx - row_number is constant within a run — pure
    window algebra, no iteration). Per asset: segment count, active
    frame count, longest segment, first segment start — the clip
    table an ASR pipeline cuts training utterances from.

    Exactness: frame energies are dyadic rationals (sum(uint8)/64)
    and their per-doc sum stays far below 2^52, so BOTH engines'
    avg() is bit-exact regardless of partial-aggregation order — the
    strict > threshold can never straddle an ulp.  Scale shape: the
    payload never shuffles (kernel is a map stage); one doc_id window
    for the threshold + islands, one aggregate — all keyed on doc_id,
    so the whole query is a single exchange."""
    a = _assets(spark, sf_dir)
    audio = a.filter(F.col("meta.modality") == "audio").select("doc_id", "payload")
    frames = audio.mapInPandas(
        _frame_feature_batches, "doc_id long, frame_idx long, fmean double"
    )
    from pyspark.sql import Window

    doc_w = Window.partitionBy("doc_id")
    act = (
        frames.withColumn("doc_avg", F.avg("fmean").over(doc_w))
        .filter(F.col("fmean") > F.col("doc_avg"))
        .select("doc_id", "frame_idx")
    )
    rn_w = Window.partitionBy("doc_id").orderBy("frame_idx")
    seg = (
        act.withColumn("grp", F.col("frame_idx") - F.row_number().over(rn_w))
        .groupBy("doc_id", "grp")
        .agg(
            F.min("frame_idx").alias("seg_start"),
            F.count(F.lit(1)).alias("seg_len"),
        )
    )
    return seg.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum("seg_len").cast("long").alias("n_active_frames"),
        F.max("seg_len").cast("long").alias("max_seg_len"),
        F.min("seg_start").cast("long").alias("first_seg_start"),
    )


@register(
    "multimodal_patch_grid_plan",
    oracle="""
    WITH assets AS (
        SELECT doc_id,
               CAST(64 + doc_id % 448 AS BIGINT)       AS width,
               CAST(64 + (doc_id * 7) % 448 AS BIGINT) AS height
        FROM documents
        WHERE doc_id % 3 = 0  -- image modality
    ),
    g AS (
        SELECT doc_id, width, height,
               CAST(ceil(width / 16.0) AS BIGINT)  AS px,
               CAST(ceil(height / 16.0) AS BIGINT) AS py
        FROM assets
    )
    SELECT px * 16 AS padded_w, py * 16 AS padded_h,
           CAST(px * py AS BIGINT)          AS n_patches,
           CAST(count(*) AS BIGINT)         AS n_images,
           CAST(sum(px * 16 * py * 16 - width * height) AS BIGINT)
                                            AS wasted_pixels,
           CAST(min(doc_id) AS BIGINT)      AS sample_doc
    FROM g
    GROUP BY px, py
    ORDER BY n_patches, padded_w
    """,
)
def multimodal_patch_grid_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style patch-grid planning over the image assets: for a
    16x16 patch size, the padded dimensions, patch count (= sequence
    length a vision encoder would see), and padding waste per
    distinct grid shape — the batching/bucketing plan a multimodal
    training pipeline builds BEFORE decoding a single image, so
    same-shape assets co-batch and padding is budgeted up front.

    Pure integer geometry from the deterministic metadata (width =
    64 + id % 448, height = 64 + 7*id % 448; reference: _assets) —
    exact on both engines.

    Scale shape: metadata-only (the payload column is never read —
    the same blob-pruned scan as `multimodal_metadata_profile`); one
    grid-shape aggregate whose cardinality is bounded by the
    (patch-grid) shape universe, ~29^2, never the asset count."""
    a = _assets(spark, sf_dir).filter(F.col("doc_id") % 3 == 0)
    g = a.select(
        "doc_id",
        F.col("meta.width").cast("long").alias("width"),
        F.col("meta.height").cast("long").alias("height"),
    ).select(
        "doc_id",
        "width",
        "height",
        F.ceil(F.col("width") / 16.0).cast("long").alias("px"),
        F.ceil(F.col("height") / 16.0).cast("long").alias("py"),
    )
    return (
        g.groupBy("px", "py")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.sum(
                F.col("px") * 16 * F.col("py") * 16
                - F.col("width") * F.col("height")
            )
            .cast("long")
            .alias("wasted_pixels"),
            F.min("doc_id").cast("long").alias("sample_doc"),
        )
        .select(
            (F.col("px") * 16).alias("padded_w"),
            (F.col("py") * 16).alias("padded_h"),
            (F.col("px") * F.col("py")).cast("long").alias("n_patches"),
            "n_images",
            "wasted_pixels",
            "sample_doc",
        )
        .orderBy("n_patches", "padded_w")
    )
