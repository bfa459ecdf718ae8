"""Multimodal column plumbing — BASELINE.json's "multimodal columns"
family: image/audio/video as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched pandas functions via
``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is
stubbed (clearly-marked ``NotImplementedError`` / deterministic fake),
while everything Spark-side is real and tested: the binary column
schema, the mapInPandas batch shape (pandas.DataFrame iterator in /
out), the declared output StructType, and partition-level parallelism.

``multimodal_binary_features`` is the oracle-checked query: it builds
a real binary payload (utf-8 bytes of the text column — at production
time this is the image/audio blob), ships it through Arrow to pandas,
and extracts byte-level features (size, md5, leading byte) that DuckDB
can verify independently. Swapping ``_extract_features``'s body for a
real `PIL.Image.open`/`soundfile.read` is the only production change.

Scale: mapInPandas streams Arrow record batches — memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``, not partition size;
binary payloads never pass through the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("first_byte", T.IntegerType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """STUB — real decode requires an image codec (PIL/opencv), absent
    in this container. The Spark-side plumbing around this call
    (binary column -> Arrow batch -> pandas) is real and tested."""
    raise NotImplementedError(
        "image decode stub: install PIL/opencv and decode payload here"
    )


def decode_audio(payload: bytes) -> "object":
    """STUB — real decode requires an audio codec (soundfile/librosa)."""
    raise NotImplementedError(
        "audio decode stub: install soundfile/librosa and decode payload here"
    )


def _make_extract_features():
    """Build the Arrow-batched feature-extraction kernel as a CLOSURE:
    cloudpickle ships nested functions by value, so executor python
    workers never need this package importable on their sys.path
    (the grading driver runs from an arbitrary cwd). Replace the
    byte-level features with decoded image/audio features in
    production; the batch shape and schema contract stay the same."""

    def extract(batches: Iterator["object"]) -> Iterator["object"]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                }
            )

    return extract


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Typed multimodal frame: (doc_id, payload BINARY, media_type).
    In production the payload column IS the stored blob; here it is
    synthesized from text so the pipeline is runnable and verifiable."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )


#: Fake-decode geometry: first STRIP "pixels" (code points) of the
#: payload; thumbnail blocks of 8 (power of 2 -> block means are
#: exact IEEE doubles on every engine); frame stride 7; audio window
#: 16 samples (integer sum of squares -> exact).
DECODE_STRIP = 64
THUMB_BLOCK = 8
FRAME_STRIDE = 7
AUDIO_WINDOW = 16

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_pixels", T.IntegerType()),
        T.StructField("thumb", T.ArrayType(T.DoubleType())),
        T.StructField("frames", T.ArrayType(T.IntegerType())),
        T.StructField("energy", T.ArrayType(T.LongType())),
    ]
)


def _make_decode_pipeline():
    """Decode -> resize (block-mean thumbnail) -> frame-sample ->
    energy-window kernel, as a closure for cloudpickle (see
    ``_make_extract_features``). The DECODE here is a deterministic
    fake (payload utf-8 code points as "pixels"); in production it
    becomes `PIL.Image.open(io.BytesIO(payload)).resize(...)` /
    frame extraction — the Arrow batch shape, output schema, and
    partition parallelism are exactly what ships."""

    strip, blk, stride, win = DECODE_STRIP, THUMB_BLOCK, FRAME_STRIDE, AUDIO_WINDOW

    def decode(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        def fake_decode(payload: bytes) -> list[int]:
            return [ord(c) for c in payload.decode("utf-8")[:strip]]

        def features(payload: bytes):
            px = fake_decode(payload)
            n = len(px)
            thumb = [
                sum(px[i : i + blk]) / len(px[i : i + blk])
                for i in range(0, n, blk)
            ]
            frames = px[::stride]
            energy = [
                sum(x * x for x in px[i : i + win]) for i in range(0, n, win)
            ]
            return n, thumb, frames, energy

        for pdf in batches:
            feats = pdf["payload"].map(features)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_pixels": feats.map(lambda f: f[0]).astype("int32"),
                    "thumb": feats.map(lambda f: f[1]),
                    "frames": feats.map(lambda f: f[2]),
                    "energy": feats.map(lambda f: f[3]),
                }
            )

    return decode


def decode_pipeline(docs: DataFrame) -> DataFrame:
    """The typed-array decode pipeline (library surface): binary
    payload -> fake decode -> thumbnail/frames/energy arrays, one
    Arrow-batched mapInPandas pass."""
    frame = with_binary_payload(docs)
    return frame.select("doc_id", "payload").mapInPandas(
        _make_decode_pipeline(), schema=DECODED_SCHEMA
    )


@register(
    "multimodal_decode_pipeline",
    oracle=f"""
    WITH px AS (
        SELECT doc_id,
               [unicode(substr(text, i, 1))
                for i in generate_series(1, least(length(text), {DECODE_STRIP}))]
                   AS pixels
        FROM documents
    )
    SELECT doc_id,
           CAST(len(pixels) AS INT) AS n_pixels,
           array_to_string(list_transform(
               [list_avg(pixels[(j - 1) * {THUMB_BLOCK} + 1 : j * {THUMB_BLOCK}])
                for j in generate_series(1, CAST(ceil(len(pixels) / {THUMB_BLOCK}.0) AS INT))],
               x -> printf('%.3f', CAST(x AS DOUBLE))), ',') AS thumb,
           array_to_string(list_transform(
               [pixels[i] for i in generate_series(1, len(pixels), {FRAME_STRIDE})],
               x -> CAST(x AS VARCHAR)), ',') AS frames,
           array_to_string(list_transform(
               [list_sum([x * x for x in
                          pixels[(j - 1) * {AUDIO_WINDOW} + 1 : j * {AUDIO_WINDOW}]])
                for j in generate_series(1, CAST(ceil(len(pixels) / {AUDIO_WINDOW}.0) AS INT))],
               x -> CAST(x AS VARCHAR)), ',') AS energy
    FROM px
    """,
    doc="Multimodal decode pipeline: binary payload -> fake decode "
    "(deterministic code-point pixels; production swaps in a real "
    "image/audio codec) -> resize (8-px block-mean thumbnail), "
    "video frame-sampling (stride 7), audio energy windows (sum of "
    "squares per 16 samples), all inside one Arrow-batched "
    "mapInPandas pass. Array outputs serialized to canonical strings "
    "(thumb at %.3f — block means over power-of-2 blocks are exact "
    "multiples of 1/8, so 3 decimals is lossless) because the "
    "driver's pandas canonicalizer cannot sort/hash list cells.",
)
def multimodal_decode_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    decoded = decode_pipeline(_t(spark, sf_dir, "documents"))
    return decoded.select(
        "doc_id",
        "n_pixels",
        F.array_join(
            F.transform("thumb", lambda x: F.format_string("%.3f", x)), ","
        ).alias("thumb"),
        F.array_join(
            F.transform("frames", lambda x: x.cast("string")), ","
        ).alias("frames"),
        F.array_join(
            F.transform("energy", lambda x: x.cast("string")), ","
        ).alias("energy"),
    )


PHASH_BITS = 60  #: house-style 60-bit hash (stays in signed-64 range)
PHASH_BANDS = 4  #: 4 x 15-bit chunks: pigeonhole-catches hamming <= 3
PHASH_HAM_MAX = 3


def _make_phash_kernel():
    """Average-hash ("aHash") perceptual fingerprint over the fake
    decode, as a closure for cloudpickle: bit i is set iff pixel i of
    the decoded strip exceeds the strip mean — the classic 8x8
    thumbnail aHash, computed here on the deterministic code-point
    pixels (production: the real decoded thumbnail). The mean is a
    single IEEE division and the comparisons are exact, so the hash
    is bit-identical on every engine."""

    strip = PHASH_BITS

    def kernel(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        def ahash(payload: bytes) -> int:
            px = [ord(c) for c in payload.decode("utf-8")[:strip]]
            if not px:
                return 0
            mean = sum(px) / len(px)
            out = 0
            for i, p in enumerate(px):
                if p > mean:
                    out |= 1 << i
            return out

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "ahash": pdf["payload"].map(ahash).astype("int64"),
                }
            )

    return kernel


@register(
    "dedup_image_phash",
    oracle=f"""
    WITH px AS (
        SELECT doc_id,
               [unicode(substr(text, i, 1))
                for i in generate_series(1, least(length(text), {PHASH_BITS}))]
                   AS p
        FROM documents),
    h AS (
        SELECT doc_id,
               -- COALESCE: list_sum over the empty pixel list is NULL,
               -- but the Spark kernel hashes an empty payload to 0 —
               -- the engines must agree or empty docs silently drop
               -- out of oracle pairs (ADVICE r4)
               COALESCE(list_sum(
                   [CASE WHEN p[i] > list_sum(p) / len(p)
                         THEN 1::BIGINT << (i - 1) ELSE 0 END
                    for i in generate_series(1, len(p))]), 0) AS ah
        FROM px)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.ah, b.ah)) AS INT) AS hamming
    FROM h a JOIN h b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.ah, b.ah)) <= {PHASH_HAM_MAX}
    """,
    doc="Perceptual-hash near-duplicate detection for the multimodal "
    "path: decode (deterministic fake; production = real thumbnail) "
    "-> 60-bit average-hash in the Arrow kernel -> 4x15-bit chunk "
    "LSH banding (pigeonhole: hamming <= 3 implies a shared chunk, "
    "recall 1.0 by construction) -> exact bit_count(xor) verify on "
    "candidates only. The oracle brute-forces all pairs; the Spark "
    "plan never does — candidates come from the chunk equi-join. "
    "Scale note (r9, measured 104s at the 100x probe / 500k docs): "
    "the 2^15 chunk space is FIXED, so candidate pairs grow "
    "n^2/2^15 per band — fine through 100x, but at ~10^7+ images "
    "widen the hash (256-bit pHash, 4x64-bit bands) or switch to "
    "multi-index hashing (Norouzi et al. 2012) so the bucket space "
    "grows with the corpus, exactly like the embedding twins' "
    "adaptive centroid draw.",
)
def dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    frame = with_binary_payload(docs)
    h = frame.select("doc_id", "payload").mapInPandas(
        _make_phash_kernel(),
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("ahash", T.LongType()),
            ]
        ),
    )
    r = PHASH_BITS // PHASH_BANDS
    mask = (1 << r) - 1
    bands = h.select(
        "doc_id",
        "ahash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        F.shiftright(F.col("ahash"), k * r)
                        .bitwiseAND(F.lit(mask))
                        .alias("c"),
                    )
                    for k in range(PHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "ahash", "band.k", "band.c")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.c") == F.col("b.c"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.ahash").alias("ha"),
            F.col("b.ahash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= PHASH_HAM_MAX)
    )


@register(
    "multimodal_binary_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte
    FROM documents
    """,
    doc="Multimodal plumbing: binary payload column -> mapInPandas "
    "(Arrow batches) -> byte-level features; decode step stubbed, "
    "batch shape and schema real.",
)
def multimodal_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    frame = with_binary_payload(docs)
    return frame.select("doc_id", "payload").mapInPandas(
        _make_extract_features(), schema=FEATURE_SCHEMA
    )


SCENE_DELTA_T = 30  #: frame-to-frame "pixel" delta marking a cut


@register(
    "multimodal_scene_changes",
    oracle=f"""
    WITH px AS (
        SELECT doc_id,
               [unicode(substr(text, i, 1))
                for i in generate_series(1, least(length(text), {DECODE_STRIP}))]
                   AS pixels
        FROM documents),
    fr AS (
        SELECT doc_id,
               [pixels[i] for i in
                generate_series(1, len(pixels), {FRAME_STRIDE})] AS frames
        FROM px)
    SELECT doc_id,
           CAST(len(frames) AS INT) AS n_frames,
           CAST(len([i for i in generate_series(1, len(frames) - 1)
                     if abs(frames[i + 1] - frames[i]) > {SCENE_DELTA_T}])
                AS INT) AS n_scene_changes
    FROM fr
    """,
    doc="Video scene-change detection on the multimodal path: the "
    "decode pipeline's sampled frames (deterministic fake; "
    "production = real frame luma) scanned for frame-to-frame "
    "deltas above a cut threshold — the shot-boundary signal a "
    "video curation pipeline keys on. Post-decode work is pure "
    "array expressions over the Arrow kernel's output; one scan.",
)
def multimodal_scene_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    decoded = decode_pipeline(_t(spark, sf_dir, "documents"))
    deltas = F.filter(
        F.sequence(F.lit(1), F.size("frames") - 1),
        lambda i: F.abs(
            F.element_at(F.col("frames"), i + 1)
            - F.element_at(F.col("frames"), i)
        )
        > SCENE_DELTA_T,
    )
    return decoded.select(
        "doc_id",
        F.size("frames").cast("int").alias("n_frames"),
        F.when(F.size("frames") >= 2, F.size(deltas))
        .otherwise(0)
        .cast("int")
        .alias("n_scene_changes"),
    )


# ------------------------------------- audio fingerprint matching
AF_STRIP = 256  #: audio decode strip (chars -> "samples")
AF_WIN = 8  #: energy window/hop (non-overlapping)
AF_BUCKET = 1024  #: energy quantization for fingerprint robustness
AF_MIN_SHARED = 3  #: pairs must share >= this many fingerprints
AF_DF_CAP_INV = 50  #: boilerplate veto, same rate as containment dedup
#: ABSOLUTE df veto alongside the relative 2% one (round 9, the
#: winnowing lesson): the constellation hash space is COARSE by
#: design (quantized energy pair + peak delta — 5,542 distinct fps
#: across the 500k-doc 100x probe corpus), so a purely relative cap
#: admits huge buckets as the corpus grows: at 100x it allowed
#: df=10,000 fps and the pair join planned sum(df^2) = 10.7e9 rows
#: (measured — ~45 GB shuffle spill, 1 GB single-task allocations,
#: 857s). df <= 200 bounds the same sum to 19.3e6. The relative cap
#: stays the tighter bound below 10k docs, so every test SF is
#: bit-unchanged; a fingerprint in >200 clips is a quantization
#: artifact, not a match (the Shazam landmark-pruning rationale,
#: Wang 2003 §2.2).
AF_DF_ABS_CAP = 200

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("energy", T.ArrayType(T.LongType())),
    ]
)


def _make_audio_energy_kernel():
    """Audio decode -> windowed energy, as a cloudpickle closure (see
    ``_make_extract_features``). The decode is the deterministic fake
    (utf-8 code points as samples); production swaps in
    ``soundfile.read`` + real RMS windows. Longer strip than the
    image/video kernel — fingerprinting needs a usable time axis."""
    strip, win = AF_STRIP, AF_WIN

    def kernel(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        def energy(payload: bytes) -> list[int]:
            px = [ord(c) for c in payload.decode("utf-8")[:strip]]
            return [
                sum(x * x for x in px[i : i + win])
                for i in range(0, len(px), win)
            ]

        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "energy": pdf["payload"].map(energy)}
            )

    return kernel


@register(
    "multimodal_audio_fingerprint_pairs",
    oracle=f"""
    WITH px AS (
        SELECT doc_id,
               [unicode(substr(text, i, 1))
                for i in generate_series(1, least(length(text), {AF_STRIP}))]
                   AS p
        FROM documents),
    en AS (SELECT doc_id,
                  [list_sum([x * x for x in p[i:i+{AF_WIN - 1}]])
                   for i in generate_series(1, len(p), {AF_WIN})] AS e
           FROM px),
    pk AS (SELECT doc_id, e,
                  [i for i in generate_series(2, len(e) - 1)
                   if e[i] > e[i-1] AND e[i] >= e[i+1]] AS peaks
           FROM en),
    fpl AS (SELECT doc_id,
                   [('0x' || substr(md5(
                       CAST(e[peaks[j]] // {AF_BUCKET} AS VARCHAR) || ':' ||
                       CAST(e[peaks[j+1]] // {AF_BUCKET} AS VARCHAR) || ':' ||
                       CAST(peaks[j+1] - peaks[j] AS VARCHAR)), 1, 15))::BIGINT
                    for j in generate_series(1, len(peaks) - 1)] AS hs
            FROM pk),
    fp AS (SELECT DISTINCT doc_id, unnest(hs) AS h FROM fpl),
    df AS (SELECT h, count(*) AS c FROM fp GROUP BY h),
    nd AS (SELECT count(*) AS n FROM documents),
    cap AS (SELECT fp.doc_id, fp.h
            FROM fp JOIN df USING (h), nd
            WHERE {AF_DF_CAP_INV} * df.c <= nd.n
              AND df.c <= {AF_DF_ABS_CAP})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM cap a JOIN cap b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= {AF_MIN_SHARED}
    """,
    doc="Audio near-duplicate detection by constellation "
    "fingerprinting (the Shazam scheme, Wang 2003): windowed energy "
    "from the decode kernel -> interior local-maxima peaks -> "
    "consecutive-peak fingerprints hash(quantized energies + time "
    "delta) -> docs sharing >= 3 rare fingerprints pair up. Decode "
    "runs in the Arrow mapInPandas kernel (deterministic fake; "
    "production = soundfile + RMS windows); everything after is "
    "codegen column expressions + one hash-keyed self-join over the "
    "df-capped fingerprint table — the same banded-join shape as "
    "minhash LSH, so raw audio never shuffles. The veto is "
    f"min(2% of clips, {AF_DF_ABS_CAP} absolute): the absolute arm "
    "is what actually bounds per-fingerprint fan-out at any corpus "
    "size (a relative-only cap admitted 10.7e9 pair rows at the "
    "100x probe — the coarse constellation hash space concentrates "
    "df as the corpus grows).",
)
def multimodal_audio_fingerprint_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    decoded = (
        with_binary_payload(docs)
        .select("doc_id", "payload")
        .mapInPandas(_make_audio_energy_kernel(), schema=AUDIO_SCHEMA)
    )
    e = F.col("energy")
    # Spark's sequence(2, n) is DESCENDING when n < 2 (the word_shingles
    # trap) — guard short arrays to an empty peak list explicitly.
    peaks_expr = F.when(
        F.size(e) >= 3,
        F.filter(
            F.sequence(F.lit(2), F.size(e) - 1),
            lambda i: (F.element_at(e, i) > F.element_at(e, i - 1))
            & (F.element_at(e, i) >= F.element_at(e, i + 1)),
        ),
    ).otherwise(F.array().cast("array<int>"))
    pk = decoded.select("doc_id", e.alias("e"), peaks_expr.alias("peaks"))

    def _fp(j):
        p = F.col("peaks")
        ej = F.element_at(F.col("e"), F.element_at(p, j))
        ej1 = F.element_at(F.col("e"), F.element_at(p, j + 1))
        s = F.concat_ws(
            ":",
            F.floor(ej / AF_BUCKET).cast("string"),
            F.floor(ej1 / AF_BUCKET).cast("string"),
            (F.element_at(p, j + 1) - F.element_at(p, j)).cast("string"),
        )
        return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")

    hs = F.when(
        F.size("peaks") >= 2,
        F.transform(F.sequence(F.lit(1), F.size("peaks") - 1), _fp),
    ).otherwise(F.array().cast("array<bigint>"))
    fp = (
        pk.select("doc_id", F.explode(hs).alias("h")).distinct()
    )
    from kinesis_analytics_demo_spark.caching import tracked_persist

    fp = tracked_persist(fp)
    dfreq = fp.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n"))
    cap = (
        fp.join(dfreq, "h")
        .crossJoin(F.broadcast(n_docs))
        .filter(
            (F.lit(AF_DF_CAP_INV) * F.col("c") <= F.col("n"))
            & (F.col("c") <= AF_DF_ABS_CAP)
        )
        .select("doc_id", "h")
    )
    a = cap.select(F.col("doc_id").alias("doc_a"), "h")
    b = cap.select(F.col("doc_id").alias("doc_b"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= AF_MIN_SHARED)
    )


# ------------------------------------- keyframe selection per shot
#: encode (max luma, then smallest frame index) as one orderable
#: integer: (LUMA_DOMAIN - luma) * KF_ENC + frame_idx — MIN picks the
#: brightest frame, ties to the earliest. LUMA_DOMAIN covers the full
#: unicode code-point range of the fake decode (production: 0-255).
KF_LUMA_DOMAIN = 1_114_112
KF_ENC = 10_000_000


@register(
    "multimodal_keyframe_select",
    oracle=f"""
    WITH px AS (
        SELECT doc_id,
               [unicode(substr(text, i, 1))
                for i in generate_series(1, least(length(text), {DECODE_STRIP}))]
                   AS pixels
        FROM documents),
    fr AS (
        SELECT doc_id,
               [pixels[i] for i in
                generate_series(1, len(pixels), {FRAME_STRIDE})] AS frames
        FROM px),
    cuts AS (
        SELECT doc_id, frames,
               [i for i in generate_series(2, len(frames))
                if abs(frames[i] - frames[i - 1]) > {SCENE_DELTA_T}] AS c
        FROM fr WHERE len(frames) > 0),
    fx AS (
        SELECT doc_id, i AS fi, frames[i] AS luma,
               len(list_filter(c, x -> x <= i)) + 1 AS shot
        FROM cuts, LATERAL (
            SELECT unnest(generate_series(1, len(frames))) AS i))
    SELECT doc_id,
           CAST(shot AS INT) AS shot_id,
           CAST(MIN(fi) AS INT) AS start_frame,
           CAST(MAX(fi) AS INT) AS end_frame,
           CAST(COUNT(*) AS INT) AS n_frames,
           CAST(MIN((CAST({KF_LUMA_DOMAIN} AS BIGINT) - luma)
                    * {KF_ENC} + fi) % {KF_ENC}
                AS INT) AS keyframe_idx,
           CAST({KF_LUMA_DOMAIN}
                - MIN((CAST({KF_LUMA_DOMAIN} AS BIGINT) - luma)
                      * {KF_ENC} + fi) // {KF_ENC}
                AS INT) AS keyframe_luma
    FROM fx GROUP BY doc_id, shot
    """,
    doc="Keyframe selection on the multimodal/video path: frames "
    "(decode pipeline's deterministic fake; production = real frame "
    "luma) are segmented into SHOTS at the scene-change cuts "
    "(|delta| > threshold, same rule as multimodal_scene_changes), "
    "and each shot contributes its brightest frame (ties to the "
    "earliest) as the keyframe — the representative-frame sampling "
    "step a video training pipeline runs before captioning/embedding "
    "so it stores one frame per shot, not FPS x duration. The "
    "argmax-with-tiebreak is the single-integer encode "
    "(DOMAIN - luma) * 10^7 + idx under MIN — pure integer "
    "arithmetic, engine-exact; shot assignment is an in-document "
    "prefix count over the cut list. Post-decode everything is "
    "array expressions + one grouped aggregate; at 100 TB the scan "
    "cost IS the decode kernel, and output is one row per shot.",
)
def multimodal_keyframe_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    decoded = decode_pipeline(_t(spark, sf_dir, "documents"))
    cuts = F.filter(
        F.sequence(F.lit(2), F.size("frames")),
        lambda i: F.abs(
            F.element_at(F.col("frames"), i)
            - F.element_at(F.col("frames"), i - 1)
        )
        > SCENE_DELTA_T,
    )
    c = decoded.filter(F.size("frames") > 0).select(
        "doc_id",
        "frames",
        F.when(F.size("frames") >= 2, cuts)
        .otherwise(F.array().cast("array<int>"))
        .alias("c"),
    )
    fx = c.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("frames")),
                lambda i: F.struct(
                    i.alias("fi"),
                    F.element_at(F.col("frames"), i).alias("luma"),
                    (
                        F.size(F.filter(F.col("c"), lambda x: x <= i)) + 1
                    ).alias("shot"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "s.fi", "s.luma", "s.shot")
    enc = (F.lit(KF_LUMA_DOMAIN) - F.col("luma")).cast("bigint") * F.lit(
        KF_ENC
    ) + F.col("fi")
    return fx.groupBy("doc_id", "shot").agg(
        F.min("fi").cast("int").alias("start_frame"),
        F.max("fi").cast("int").alias("end_frame"),
        F.count(F.lit(1)).cast("int").alias("n_frames"),
        (F.min(enc) % KF_ENC).cast("int").alias("keyframe_idx"),
        (F.lit(KF_LUMA_DOMAIN) - F.floor(F.min(enc) / KF_ENC))
        .cast("int")
        .alias("keyframe_luma"),
    ).select(
        "doc_id",
        F.col("shot").cast("int").alias("shot_id"),
        "start_frame",
        "end_frame",
        "n_frames",
        "keyframe_idx",
        "keyframe_luma",
    )
