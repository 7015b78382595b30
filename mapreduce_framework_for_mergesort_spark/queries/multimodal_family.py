"""Multimodal binary-column queries.

``q_multimodal_binary`` proves the binary plumbing end-to-end with full
oracle parity (payload bytes, lengths, sha256 digests agree across
engines).  ``q_multimodal_features`` runs the decode/feature seam over
four modalities — the closed-form text featurizer plus real stdlib
container parses for WAV/PCM audio, 24-bit BMP images, and YUV4MPEG2
grayscale video — all with exact SQL oracles recomputed from the source
text (the features are closed-form over the payload bytes by
construction; the fixture being ASCII — pinned in
tests/test_llm_ops.py — is what makes char arithmetic equal byte
arithmetic in the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark.io import (
    load_table,
    scan_parallelism,
)
from mapreduce_framework_for_mergesort_spark.operators import dedup as D
from mapreduce_framework_for_mergesort_spark.queries import query
from mapreduce_framework_for_mergesort_spark.sources import containers as CT
from mapreduce_framework_for_mergesort_spark.sources import layer3 as L3
from mapreduce_framework_for_mergesort_spark.sources import multimodal as M


def _spread_reps(
    reps: DataFrame, sf_dir: str, n_chains: int
) -> DataFrame:
    """Round 12 (optimization): the representative set feeds
    ``n_chains`` synth→decode mapInPandas chains evaluated together in
    one union, and after the exact-dup semi-join AQE coalesces it to
    ~1 partition at fixture scale (tiny bytes, huge per-row decode
    CPU) — so every chain ran ~single-task.  Spread reps to
    ``ceil(cores / n_chains)`` partitions so the union's concurrent
    chains together fill the cores without flooding the Python worker
    pool with per-task overhead (measured at sf0.1, warm interleaved:
    none 3.8 s, n=4 2.3 s, n=8 2.7 s, n=32 5.7 s — more tasks than
    cores across 10 chains is a regression, not a win).  Fires only
    when the documents SCAN is itself parallelism-starved (single-file
    fixtures); at corpus scale the join output is already wide and the
    shape is untouched."""
    spark = reps.sparkSession
    cores = spark.sparkContext.defaultParallelism
    n = -(-cores // n_chains)
    if n <= 1 or scan_parallelism(sf_dir, "documents", spark) >= cores:
        return reps
    return reps.repartition(n)


def _join_back_to_docs(
    docs: DataFrame, reps: DataFrame, rep_rows: DataFrame
) -> DataFrame:
    """Fan representative-keyed rows (``__rep`` column) back out to
    every document id sharing the representative's text — the join-back
    half of the decode-once-per-distinct-content collapse.  Both joins
    are content-hash equi-joins; md5(text) is non-null here (the
    fixture and every synthesized modality path require text)."""
    rep_h = reps.select(
        F.col("doc_id").alias("__rep"),
        F.md5(F.col("text").cast("binary")).alias("__th"),
    )
    hashed = docs.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("__th")
    )
    return hashed.join(rep_h, "__th").join(rep_rows, "__rep").drop(
        "__th", "__rep"
    )


@query(
    "q_multimodal_binary",
    oracle="""
    SELECT doc_id,
           'text' AS modality,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS digest
    FROM documents
    """,
)
def q_multimodal_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column + metadata: length and content digest
    computed JVM-side over the bytes."""
    b = M.binarize_documents(load_table(spark, sf_dir, "documents"))
    return b.select(
        "doc_id",
        "modality",
        F.col("meta_n_bytes").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("digest"),
    )


@query(
    "q_multimodal_features",
    oracle=f"""
    SELECT doc_id,
           modality,
           n_bytes,
           array_to_string([
               n_bytes,
               CASE WHEN n_bytes > 0 THEN unicode(substr(text, 1, 1)) ELSE 0 END,
               CASE WHEN n_bytes > 0 THEN unicode(substr(text, length(text), 1)) ELSE 0 END,
               CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT),
               CAST(length(text) - length(replace(text, 'a', '')) AS BIGINT),
               CAST(length(text) - length(replace(text, 'e', '')) AS BIGINT),
               n_bytes % 251,
               CASE WHEN n_bytes > 0
                    THEN (unicode(substr(text, 1, 1)) * 31
                          + unicode(substr(text, length(text), 1))) % 997
                    ELSE 0 END
           ], ',') AS feature_csv
    FROM (
        SELECT doc_id, 'text' AS modality, text,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents
    )
    UNION ALL
    SELECT doc_id,
           'audio' AS modality,
           CAST(44 + 2 * strlen(text) AS BIGINT) AS n_bytes,
           CASE WHEN strlen(text) = 0 THEN '0,0,0,0,0,0,0,0'
           ELSE array_to_string([
               CAST(strlen(text) AS BIGINT),
               {M.AUDIO_RATE},
               (list_min(ch) - 128) * 256,
               (list_max(ch) - 128) * 256,
               (ch[1] - 128) * 256,
               (ch[strlen(text)] - 128) * 256,
               CAST(list_sum(list_transform(ch, c -> abs((c - 128) * 256)))
                    % {M.AUDIO_SUM_MOD} AS BIGINT),
               CAST(len(list_filter(ch, c -> c > 128)) AS BIGINT)
           ], ',') END AS feature_csv
    FROM (
        SELECT doc_id, text,
               list_transform(range(1, strlen(text) + 1),
                              i -> unicode(substr(text, i, 1))) AS ch
        FROM documents
    )
    UNION ALL
    SELECT doc_id,
           'mp4' AS modality,
           -- ISO-BMFF closed form (round 9, sources/containers.py):
           -- fixed box skeleton + 2 B PCM per sample + one 8-byte stts
           -- run + 12-byte stsc runs (two when a short tail chunk
           -- needs its own run) + 4 B per stco chunk offset
           CASE WHEN strlen(text) = 0 THEN CAST({CT.MP4_EMPTY} AS BIGINT)
           ELSE CAST({CT.MP4_EMPTY} + 2 * strlen(text) + 8
                + 12 * (CASE WHEN strlen(text) > {CT.MP4_SAMPLES_PER_CHUNK}
                              AND strlen(text) % {CT.MP4_SAMPLES_PER_CHUNK} <> 0
                        THEN 2 ELSE 1 END)
                + 4 * ((strlen(text) + {CT.MP4_SAMPLES_PER_CHUNK - 1})
                       // {CT.MP4_SAMPLES_PER_CHUNK}) AS BIGINT) END
               AS n_bytes,
           -- decode runs through the stts/stsc/stsz/stco sample table
           -- to the same PCM the WAV branch carries, so the feature
           -- vector is identical to the audio branch's
           CASE WHEN strlen(text) = 0 THEN '0,0,0,0,0,0,0,0'
           ELSE array_to_string([
               CAST(strlen(text) AS BIGINT),
               {M.AUDIO_RATE},
               (list_min(ch) - 128) * 256,
               (list_max(ch) - 128) * 256,
               (ch[1] - 128) * 256,
               (ch[strlen(text)] - 128) * 256,
               CAST(list_sum(list_transform(ch, c -> abs((c - 128) * 256)))
                    % {M.AUDIO_SUM_MOD} AS BIGINT),
               CAST(len(list_filter(ch, c -> c > 128)) AS BIGINT)
           ], ',') END AS feature_csv
    FROM (
        SELECT doc_id, text,
               list_transform(range(1, strlen(text) + 1),
                              i -> unicode(substr(text, i, 1))) AS ch
        FROM documents
    )
    UNION ALL
    SELECT doc_id,
           'fmp4' AS modality,
           -- FRAGMENTED ISO-BMFF closed form (round 10,
           -- sources/containers.py synthesize_fmp4): fixed
           -- ftyp+moov(+mvex/trex) skeleton, then per 16-sample
           -- fragment a constant 96-byte moof+mdat-header overhead
           -- plus 2 B PCM per sample
           CASE WHEN strlen(text) = 0 THEN CAST({CT.FMP4_EMPTY} AS BIGINT)
           ELSE CAST({CT.FMP4_EMPTY} + 2 * strlen(text)
                + {CT.FMP4_FRAGMENT_OVERHEAD}
                  * ((strlen(text) + {CT.MP4_SAMPLES_PER_CHUNK - 1})
                     // {CT.MP4_SAMPLES_PER_CHUNK}) AS BIGINT) END
               AS n_bytes,
           -- decode resolves spans through the trex->tfhd->trun
           -- default-inheritance chain to the same PCM as the WAV and
           -- progressive-mp4 branches, so the features are identical
           CASE WHEN strlen(text) = 0 THEN '0,0,0,0,0,0,0,0'
           ELSE array_to_string([
               CAST(strlen(text) AS BIGINT),
               {M.AUDIO_RATE},
               (list_min(ch) - 128) * 256,
               (list_max(ch) - 128) * 256,
               (ch[1] - 128) * 256,
               (ch[strlen(text)] - 128) * 256,
               CAST(list_sum(list_transform(ch, c -> abs((c - 128) * 256)))
                    % {M.AUDIO_SUM_MOD} AS BIGINT),
               CAST(len(list_filter(ch, c -> c > 128)) AS BIGINT)
           ], ',') END AS feature_csv
    FROM (
        SELECT doc_id, text,
               list_transform(range(1, strlen(text) + 1),
                              i -> unicode(substr(text, i, 1))) AS ch
        FROM documents
    )
    UNION ALL
    SELECT doc_id,
           'image' AS modality,
           CAST({M.IMG_HEADER} + {3 * M.IMG_WIDTH}
                * ((strlen(text) + {M.IMG_WIDTH - 1}) // {M.IMG_WIDTH})
                AS BIGINT) AS n_bytes,
           CASE WHEN strlen(text) = 0 THEN '0,0,0,0,0,0,0,0'
           ELSE array_to_string([
               {M.IMG_WIDTH},
               (strlen(text) + {M.IMG_WIDTH - 1}) // {M.IMG_WIDTH},
               {M.IMG_WIDTH}
                 * ((strlen(text) + {M.IMG_WIDTH - 1}) // {M.IMG_WIDTH}),
               ch[1],
               CASE WHEN strlen(text) % {M.IMG_WIDTH} = 0
                    THEN ch[strlen(text)] ELSE 0 END,
               list_max(ch),
               CAST(list_sum(ch) % {M.AUDIO_SUM_MOD} AS BIGINT),
               CAST(len(list_filter(ch, c -> c = 32)) AS BIGINT)
           ], ',') END AS feature_csv
    FROM (
        SELECT doc_id, text,
               list_transform(range(1, strlen(text) + 1),
                              i -> unicode(substr(text, i, 1))) AS ch
        FROM documents
    )
    UNION ALL
    SELECT doc_id,
           'png' AS modality,
           -- 8 sig + 25 IHDR + 12 IDAT framing + 12 IEND = 57, plus the
           -- stored-block zlib stream: 2 hdr + 5/block + raw + 4 adler,
           -- raw = rows x (1 filter byte + 16 px)
           CAST(63 + 5 * greatest(1, (raw + 65534) // 65535) + raw
                AS BIGINT) AS n_bytes,
           CASE WHEN strlen(text) = 0 THEN '0,0,0,0,0,0,0,0'
           ELSE array_to_string([
               {M.IMG_WIDTH},
               (strlen(text) + {M.IMG_WIDTH - 1}) // {M.IMG_WIDTH},
               {M.IMG_WIDTH}
                 * ((strlen(text) + {M.IMG_WIDTH - 1}) // {M.IMG_WIDTH}),
               ch[1],
               CASE WHEN strlen(text) % {M.IMG_WIDTH} = 0
                    THEN ch[strlen(text)] ELSE 0 END,
               list_max(ch),
               CAST(list_sum(ch) % {M.AUDIO_SUM_MOD} AS BIGINT),
               CAST(len(list_filter(ch, c -> c = 32)) AS BIGINT)
           ], ',') END AS feature_csv
    FROM (
        SELECT doc_id, text,
               list_transform(range(1, strlen(text) + 1),
                              i -> unicode(substr(text, i, 1))) AS ch,
               CASE WHEN strlen(text) = 0 THEN 0
                    ELSE ((strlen(text) + {M.IMG_WIDTH - 1})
                          // {M.IMG_WIDTH}) * {M.IMG_WIDTH + 1} END AS raw
        FROM documents
    )
    UNION ALL
    SELECT doc_id,
           'jpeg' AS modality,
           -- fixed header + exactly 2 entropy bytes per 8x8 block
           -- (one block per source byte; the flat-block encoder's
           -- 16-bit-per-block Huffman layout is provably stuffing-free
           -- — see sources/multimodal.py JPEG section)
           CAST({M.JPEG_HEADER} + 2 * strlen(text) AS BIGINT) AS n_bytes,
           CASE WHEN strlen(text) = 0 THEN '0,0,0,0,0,0,0,0'
           ELSE array_to_string([
               {M.JPEG_WIDTH},
               8 * strlen(text),
               64 * strlen(text),
               ch[1],
               ch[strlen(text)],
               list_max(ch),
               CAST((64 * list_sum(ch)) % {M.AUDIO_SUM_MOD} AS BIGINT),
               CAST(64 * len(list_filter(ch, c -> c = 32)) AS BIGINT)
           ], ',') END AS feature_csv
    FROM (
        SELECT doc_id, text,
               list_transform(range(1, strlen(text) + 1),
                              i -> unicode(substr(text, i, 1))) AS ch
        FROM documents
    )
    UNION ALL
    SELECT doc_id,
           'jpeg_color' AS modality,
           -- fixed color header + one 4:4:4 MCU (3 DC-only blocks =
           -- 6 entropy bytes) per source byte, stuffing-free like the
           -- greyscale layout
           CAST({M.JPEGC_HEADER} + 6 * strlen(text) AS BIGINT) AS n_bytes,
           CASE WHEN strlen(text) = 0 THEN '0,0,0,0,0,0,0,0'
           ELSE array_to_string([
               {M.JPEG_WIDTH},
               8 * strlen(text),
               192 * strlen(text),
               rs[1],
               bs[strlen(text)],
               greatest(list_max(rs), list_max(gs), list_max(bs)),
               CAST((64 * (list_sum(rs) + list_sum(gs) + list_sum(bs)))
                    % {M.AUDIO_SUM_MOD} AS BIGINT),
               CAST(64 * (len(list_filter(rs, v -> v = 32))
                          + len(list_filter(gs, v -> v = 32))
                          + len(list_filter(bs, v -> v = 32)))
                    AS BIGINT)
           ], ',') END AS feature_csv
    FROM (
        -- synthesis maps byte c to the flat MCU (Y=c, Cb=255-c,
        -- Cr=(3c+7)%256); decode recovers those integers exactly and
        -- converts with the pinned JFIF formula — floor(x+0.5), the
        -- same literals and op order as the engine's numpy twin, so
        -- the doubles agree bit-for-bit
        SELECT doc_id, text,
               list_transform(ch, c -> CAST(greatest(0, least(255,
                   floor(c + {M._JPEGC_R_CR} * (((3*c+7) % 256) - 128)
                         + 0.5))) AS BIGINT)) AS rs,
               list_transform(ch, c -> CAST(greatest(0, least(255,
                   floor(c - {M._JPEGC_G_CB} * ((255-c) - 128)
                           - {M._JPEGC_G_CR} * (((3*c+7) % 256) - 128)
                         + 0.5))) AS BIGINT)) AS gs,
               list_transform(ch, c -> CAST(greatest(0, least(255,
                   floor(c + {M._JPEGC_B_CB} * ((255-c) - 128)
                         + 0.5))) AS BIGINT)) AS bs
        FROM (
            SELECT doc_id, text,
                   list_transform(range(1, strlen(text) + 1),
                                  i -> unicode(substr(text, i, 1))) AS ch
            FROM documents
        )
    )
    UNION ALL
    SELECT doc_id,
           'video' AS modality,
           CAST({M.VID_HEADER} + {M.VID_FRAME_HDR + M.VID_FRAME_PX}
                * ((strlen(text) + {M.VID_FRAME_PX - 1}) // {M.VID_FRAME_PX})
                AS BIGINT) AS n_bytes,
           CASE WHEN strlen(text) = 0 THEN '0,0,0,0,0,0,0,0'
           ELSE array_to_string([
               (strlen(text) + {M.VID_FRAME_PX - 1}) // {M.VID_FRAME_PX},
               {M.VID_WIDTH},
               {M.VID_HEIGHT},
               ch[1],
               CASE WHEN strlen(text) % {M.VID_FRAME_PX} = 0
                    THEN ch[strlen(text)] ELSE 0 END,
               list_max(ch),
               CAST(list_sum(ch) % {M.AUDIO_SUM_MOD} AS BIGINT),
               CAST(len(list_filter(ch, c -> c = 32)) AS BIGINT)
           ], ',') END AS feature_csv
    FROM (
        SELECT doc_id, text,
               list_transform(range(1, strlen(text) + 1),
                              i -> unicode(substr(text, i, 1))) AS ch
        FROM documents
    )
    UNION ALL
    SELECT doc_id,
           'mp3' AS modality,
           -- one 288-byte Layer III profile frame per document
           CAST(288 AS BIGINT) AS n_bytes,
           -- the tone-placement closed form (sources/layer3.py
           -- tone_bins_for_text): bin_i = 18*i + 8 + (ch_i % 2) for
           -- i = 1..min(4, len), negative iff ch_i odd, gain 210;
           -- features [n_frames, n_nonzero, max_bin, sum_bins,
           -- n_negative, global_gain, 1000*energy, active_subbands]
           -- come back through the REAL count1-Huffman / requantize /
           -- alias / IMDCT chain
           array_to_string([
               1,
               n,
               CASE WHEN n = 0 THEN 0
                    ELSE 18 * n + 8 + (ch[CAST(n AS INT)] % 2) END,
               CASE WHEN n = 0 THEN 0
                    ELSE CAST(list_sum(list_transform(range(1, n + 1),
                         i -> 18 * i + 8 + (ch[CAST(i AS INT)] % 2)))
                         AS BIGINT) END,
               CAST(len(list_filter(ch[1:CAST(n AS INT)],
                                    c -> c % 2 = 1)) AS BIGINT),
               210,
               1000 * n,
               n
           ], ',') AS feature_csv
    FROM (
        SELECT doc_id, text,
               CAST(least(length(text), 4) AS BIGINT) AS n,
               list_transform(range(1, strlen(text) + 1),
                              i -> unicode(substr(text, i, 1))) AS ch
        FROM documents
    )
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode → fixed-width feature vectors,
    over TEN branches: the closed-form text featurizer, a real
    stdlib WAV/PCM audio parse, a real ISO-BMFF mp4 parse whose PCM
    decode runs through the full stts/stsc/stsz/stco sample-table
    resolution (round 9, ``sources/containers.py`` — the feature
    vector provably equals the WAV branch's because both carry the
    same samples, while n_bytes pins the per-entry box arithmetic), a
    FRAGMENTED mp4 parse of the same PCM through the DASH/CMAF
    moof/trun tables (round 10 — identical features via a disjoint
    resolution path, n_bytes pinning the per-fragment overhead), a
    real stdlib BMP image parse, a real
    zlib PNG parse, real baseline-JFIF JPEG parses in BOTH greyscale
    and YCbCr color (Huffman + IDCT + the pinned floor(x+0.5) JFIF
    RGB conversion — round 7), and a real YUV4MPEG2 grayscale video
    parse, and (round 11) a REAL MPEG-1 Layer III spectral decode over
    the tone profile — count1-table-B Huffman, requantization, alias
    reduction, IMDCT to subband samples (``sources/layer3.py``; the
    big-values tables and polyphase window stay the loud data seam)
    (payloads
    synthesized from the same text bytes, so the oracle recomputes
    every branch from source — the n_bytes checks even pin the 44-byte
    RIFF header, the 54-byte BMP header + 4-aligned bottom-up rows,
    the PNG stored-deflate stream, the JPEG 2-bytes-per-block entropy
    segment, the mp4 sample-table entries, and the Y4M stream-header +
    per-FRAME-marker layout the containers must produce).

    The feature array is projected to a CSV string because the driver's
    canonicalizer cannot hash array cells (round-1 `unhashable type:
    'list'` failure); the feature values are integral by construction so
    the long cast is exact (audio features < 2^24, exact in float32).
    """
    docs = load_table(spark, sf_dir, "documents")
    # synth + decode run once per DISTINCT text (round 6 — payloads
    # and features are pure functions of the text, so replicas reuse
    # their representative's decode; production decodes a payload once
    # per distinct content, not once per copy): the mapInPandas chain
    # runs over exact-dup representatives and the per-doc rows come
    # back through one md5(text) join.
    reps = _spread_reps(
        docs.join(D.exact_rep_ids(docs), "doc_id", "semi"), sf_dir, 10
    )
    b = (
        M.binarize_documents(reps)
        .unionByName(M.binarize_audio_documents(reps))
        .unionByName(CT.binarize_mp4_documents(reps))
        .unionByName(CT.binarize_fmp4_documents(reps))
        .unionByName(M.binarize_image_documents(reps))
        .unionByName(M.binarize_png_documents(reps))
        .unionByName(M.binarize_jpeg_documents(reps))
        .unionByName(M.binarize_jpeg_color_documents(reps))
        .unionByName(M.binarize_video_documents(reps))
        # round 11: the TENTH branch — Layer III spectral decode over
        # the tone profile (sources/layer3.py); features ride the
        # real count1-Huffman → requantize → alias → IMDCT chain and
        # the oracle recomputes them from the tone-placement closed
        # form
        .unionByName(L3.binarize_mp3l3_documents(reps))
    )
    feats = M.extract_features(b).select(
        F.col("doc_id").alias("__rep"),
        "modality",
        "n_bytes",
        F.array_join(
            F.transform(F.col("feature"), lambda x: x.cast("long").cast("string")),
            ",",
        ).alias("feature_csv"),
    )
    return _join_back_to_docs(docs, reps, feats).select(
        "doc_id", "modality", "n_bytes", "feature_csv"
    )


@query(
    "q_multimodal_frames",
    oracle=f"""
    SELECT doc_id,
           'text' AS modality,
           CAST((((strlen(text) + {M.FRAME_BYTES - 1}) // {M.FRAME_BYTES}) + 1) // 2
                AS BIGINT) AS n_frames,
           CAST(least(strlen(text), {M.FRAME_BYTES}) AS BIGINT) AS first_frame_bytes
    FROM documents
    WHERE strlen(text) > 0
    UNION ALL
    SELECT doc_id,
           'image' AS modality,
           CAST(((((strlen(text) + {M.IMG_WIDTH - 1}) // {M.IMG_WIDTH})
                  + {M.IMG_BAND_ROWS - 1}) // {M.IMG_BAND_ROWS} + 1) // 2
                AS BIGINT) AS n_frames,
           CAST({M.IMG_HEADER} + {3 * M.IMG_WIDTH}
                * least((strlen(text) + {M.IMG_WIDTH - 1}) // {M.IMG_WIDTH},
                        {M.IMG_BAND_ROWS})
                AS BIGINT) AS first_frame_bytes
    FROM documents
    WHERE strlen(text) > 0
    UNION ALL
    SELECT doc_id,
           'png' AS modality,
           CAST(((((strlen(text) + {M.IMG_WIDTH - 1}) // {M.IMG_WIDTH})
                  + {M.IMG_BAND_ROWS - 1}) // {M.IMG_BAND_ROWS} + 1) // 2
                AS BIGINT) AS n_frames,
           -- 63 + one 5-byte stored block + 17 bytes per band row
           CAST(68 + {M.IMG_WIDTH + 1}
                * least((strlen(text) + {M.IMG_WIDTH - 1}) // {M.IMG_WIDTH},
                        {M.IMG_BAND_ROWS})
                AS BIGINT) AS first_frame_bytes
    FROM documents
    WHERE strlen(text) > 0
    UNION ALL
    SELECT doc_id,
           'jpeg' AS modality,
           -- one band per JPEG_BAND_BLOCKS source bytes, every 2nd
           CAST(((strlen(text) + {M.JPEG_BAND_BLOCKS - 1})
                 // {M.JPEG_BAND_BLOCKS} + 1) // 2 AS BIGINT) AS n_frames,
           -- each band re-encodes as a standalone <=8-block JPEG
           CAST({M.JPEG_HEADER}
                + 2 * least(strlen(text), {M.JPEG_BAND_BLOCKS})
                AS BIGINT) AS first_frame_bytes
    FROM documents
    WHERE strlen(text) > 0
    UNION ALL
    SELECT doc_id,
           'jpeg_color' AS modality,
           CAST(((strlen(text) + {M.JPEG_BAND_BLOCKS - 1})
                 // {M.JPEG_BAND_BLOCKS} + 1) // 2 AS BIGINT) AS n_frames,
           -- each band re-encodes as a standalone <=8-MCU color JPEG
           CAST({M.JPEGC_HEADER}
                + 6 * least(strlen(text), {M.JPEG_BAND_BLOCKS})
                AS BIGINT) AS first_frame_bytes
    FROM documents
    WHERE strlen(text) > 0
    UNION ALL
    SELECT doc_id,
           'video' AS modality,
           CAST((((strlen(text) + {M.VID_FRAME_PX - 1}) // {M.VID_FRAME_PX})
                 + 1) // 2 AS BIGINT) AS n_frames,
           CAST({M.VID_HEADER + M.VID_FRAME_HDR + M.VID_FRAME_PX}
                AS BIGINT) AS first_frame_bytes
    FROM documents
    WHERE strlen(text) > 0
    UNION ALL
    SELECT doc_id,
           'mp4' AS modality,
           -- temporal units = stsc/stco CHUNKS (16 samples each),
           -- every 2nd sampled; each re-encodes as a standalone mp4
           -- whose closed-form size pins the re-encode (round 9)
           CAST(((strlen(text) + {CT.MP4_SAMPLES_PER_CHUNK - 1})
                 // {CT.MP4_SAMPLES_PER_CHUNK} + 1) // 2 AS BIGINT)
               AS n_frames,
           -- a <=16-sample mp4 is always single-chunk/single-stsc-run:
           -- skeleton + 2 B/sample + stts(8) + stsc(12) + stco(4)
           CAST({CT.MP4_EMPTY + 24}
                + 2 * least(strlen(text), {CT.MP4_SAMPLES_PER_CHUNK})
                AS BIGINT) AS first_frame_bytes
    FROM documents
    WHERE strlen(text) > 0
    UNION ALL
    SELECT doc_id,
           'fmp4' AS modality,
           -- fragmented layout (round 10): temporal units = per-trun
           -- runs (16 samples each, mirroring the progressive chunk
           -- grouping), every 2nd sampled; each unit re-encodes
           -- through the shared progressive writer, so the size
           -- closed form is the SAME as the mp4 branch's — pinning
           -- that fragment resolution yields byte-identical units
           CAST(((strlen(text) + {CT.MP4_SAMPLES_PER_CHUNK - 1})
                 // {CT.MP4_SAMPLES_PER_CHUNK} + 1) // 2 AS BIGINT)
               AS n_frames,
           CAST({CT.MP4_EMPTY + 24}
                + 2 * least(strlen(text), {CT.MP4_SAMPLES_PER_CHUNK})
                AS BIGINT) AS first_frame_bytes
    FROM documents
    WHERE strlen(text) > 0
    UNION ALL
    SELECT doc_id,
           'mp3' AS modality,
           -- units = MPEG frames (284 payload bytes each at the
           -- synthesis profile), every 2nd; extraction is the raw
           -- byte-delimited frame, headers included
           CAST(((strlen(text) + {CT.MP3_FRAME_PAYLOAD - 1})
                 // {CT.MP3_FRAME_PAYLOAD} + 1) // 2 AS BIGINT)
               AS n_frames,
           CAST({CT.MP3_FRAME_LEN} AS BIGINT) AS first_frame_bytes
    FROM documents
    WHERE strlen(text) > 0
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out, then a per-(doc, modality) reduction the
    oracle derives in closed form from payload length: the text branch
    samples every 2nd 64-byte window; the image branch TILES the real
    BMP into 4-row band BMPs (the vision patching op) and samples every
    2nd band — its first_frame_bytes pins the band re-encode's full
    54-byte-header + 48-byte-row layout; the JPEG branches (greyscale
    AND YCbCr color — round 7) tile at multi-block granularity
    (``JPEG_BAND_BLOCKS`` blocks per band, so bands carry ~the same
    source bytes as the other branches), every band a standalone
    decodable JPEG whose closed-form size first_frame_bytes pins; the
    video branch extracts every 2nd temporal FRAME from the real Y4M
    container, each re-encoded as a standalone single-frame clip whose
    36-byte header + FRAME marker + 32-byte plane the constant
    first_frame_bytes pins; the mp4 branch (round 9) extracts every
    2nd sample-table CHUNK through the real stsc/stco resolution, each
    re-encoded as a standalone decodable mp4 whose closed-form size
    first_frame_bytes pins; the fmp4 branch (round 10) extracts the
    same temporal units through the FRAGMENTED moof/trun resolution —
    its oracle block is byte-identical to the mp4 branch's, which is
    the pin that fragment resolution yields the same units; and the
    mp3 branch walks the real MPEG
    frame syncs past the ID3v2 tag and samples every 2nd byte-delimited
    frame.  The mapInPandas 1→N plumbing is exercised
    for real, and its row arithmetic is exactly verified."""
    docs = load_table(spark, sf_dir, "documents")
    # same decode-once-per-distinct-content collapse as the features
    # key: the synth → frame fan-out → per-doc reduction is a pure
    # function of the text, so it runs over representatives and the
    # aggregate rows join back to every doc id
    reps = _spread_reps(
        docs.join(D.exact_rep_ids(docs), "doc_id", "semi"), sf_dir, 9
    )
    b = (
        M.binarize_documents(reps)
        .unionByName(M.binarize_image_documents(reps))
        .unionByName(M.binarize_png_documents(reps))
        .unionByName(M.binarize_jpeg_documents(reps))
        .unionByName(M.binarize_jpeg_color_documents(reps))
        .unionByName(M.binarize_video_documents(reps))
        .unionByName(CT.binarize_mp4_documents(reps))
        .unionByName(CT.binarize_fmp4_documents(reps))
        .unionByName(CT.binarize_mp3_documents(reps))
    )
    frames = M.sample_frames(b, every_n=2)
    per_rep = frames.groupBy(
        F.col("doc_id").alias("__rep"), F.col("modality")
    ).agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max(
            F.when(F.col("frame_idx") == 0, F.col("frame_n_bytes"))
        ).alias("first_frame_bytes"),
    )
    return _join_back_to_docs(docs, reps, per_rep).select(
        "doc_id", "modality", "n_frames", "first_frame_bytes"
    )
