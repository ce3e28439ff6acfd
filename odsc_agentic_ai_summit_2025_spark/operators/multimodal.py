"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` operators.

The reference corpus is text-only, but a training-data pipeline at
100 TB carries images/audio/video as ``binary`` columns beside typed
metadata — the layout here. Design rules:

- The payload is OPAQUE to Spark: filters/joins/pruning run on the
  metadata struct; only the Python kernels touch bytes, in Arrow
  batches (never row-at-a-time).
- Codecs are tiered: BMP/WAV decode with dependency-free stdlib
  codecs (``functions/codecs.py``), compressed rasters via the
  import-guarded PIL path, video via the ffmpeg-CLI path — each
  raising a clear error at its seam where the library is absent —
  and ``decode=fake`` (SHA-256 expansion) remains as the
  correctness stand-in for formats with no codec anywhere. Audio
  feature extraction (``mel_features``) is REAL numpy-FFT DSP, no
  library needed. Everything Spark-side — schema, partitioning,
  batch shape, UDF signatures — is tested.
- At scale: payloads dominate bytes; keep them OUT of shuffles.
  Every operator below is shuffle-free (mapInPandas preserves
  partitioning); pair with metadata-only pre-filters so decode work
  is pruned before it runs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.io import ensure_min_partitions

MEDIA_META = T.StructType(
    [
        T.StructField("kind", T.StringType()),        # image|audio|video
        T.StructField("format", T.StringType()),      # fake codec tag
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

N_HIST_BINS = 16
FEATURE_DIM = N_HIST_BINS


def synth_media(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    kind: str = "image",
) -> DataFrame:
    """Deterministic fake media table derived from the documents
    corpus: payload = UTF-8 bytes of the text (a stand-in for encoded
    pixels), metadata derived from id/length. Pure built-ins, so the
    synthesis itself is oracle-checkable."""
    n = F.length(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit("fake/v1").alias("format"),
            (F.pmod(F.col(id_col), F.lit(64)) + 8).cast("int").alias("width"),
            (F.pmod(F.col(id_col), F.lit(48)) + 8).cast("int").alias("height"),
            F.lit(3).alias("channels"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod(F.col(id_col), F.lit(30)) + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _fake_pixels(payload: bytes, n: int) -> bytes:
    """SHA-256 counter-mode expansion of the payload → n deterministic
    bytes (the stub 'decoder')."""
    out = bytearray()
    counter = 0
    seed = hashlib.sha256(payload).digest()
    while len(out) < n:
        out.extend(hashlib.sha256(seed + counter.to_bytes(4, "big")).digest())
        counter += 1
    return bytes(out[:n])


def synth_real_media(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    kind: str = "image",
) -> DataFrame:
    """Media table whose payloads are REAL file formats: 24-bit BMP
    images (kind='image') or 16-bit PCM WAV audio (kind='audio'),
    with content deterministically derived from the text (SHA-256
    expansion) and geometry from the id — so ``decoder='real'`` has
    honest bytes to parse without any codec library."""
    from ..functions.codecs import encode_bmp, encode_wav

    base = synth_media(docs, id_col, text_col, kind)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd  # noqa: F401

        for pdf in batches:
            payloads = []
            metas = []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                m = dict(m)
                if kind == "audio":
                    n = m["sample_rate"] // 100  # 10 ms of samples
                    samples = _fake_pixels(bytes(p), n * 2)
                    payloads.append(
                        encode_wav(samples, m["sample_rate"], channels=1)
                    )
                    m["format"] = "audio/wav"
                    m["channels"] = 1
                    m["n_frames"] = n
                else:
                    w, h = m["width"], m["height"]
                    rgb = _fake_pixels(bytes(p), w * h * 3)
                    payloads.append(encode_bmp(rgb, w, h))
                    m["format"] = "image/bmp"
                metas.append(m)
            out = pdf.copy()
            out["payload"] = payloads
            out["meta"] = metas
            yield out

    return ensure_min_partitions(base).mapInPandas(run, MEDIA_SCHEMA)


def decode_media(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """payload → raw pixel/sample bytes.

    ``decoder='fake'`` sizes output by the metadata and derives bytes
    from the payload digest (the correctness stand-in).
    ``decoder='real'`` PARSES the payload: BMP and WAV decode with the
    dependency-free codecs in ``functions/codecs.py`` (geometry comes
    from the file header, not the metadata); compressed formats raise
    ``NotImplementedError`` at the external-codec seam (PIL/ffmpeg).
    ``decoder='pil'`` crosses that seam: Pillow decodes every raster
    format it knows (JPEG/PNG/BMP/…, WAV still via stdlib) behind an
    import guard — identical output to 'real' on BMP (tested), an
    ImportError from the executors where Pillow isn't installed.
    ``decoder='ffmpeg'`` crosses the video half the same way: the
    ffmpeg CLI decodes any container/codec it knows to concatenated
    RGB24 frame bytes (BMP/WAV still via the stdlib codecs), a
    RuntimeError where ffmpeg isn't installed.
    """
    import pandas as pd

    if decoder not in ("fake", "real", "pil", "ffmpeg"):
        raise ValueError(f"unknown decoder {decoder!r}")

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("pixels", T.BinaryType()),
            T.StructField("n_bytes", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.codecs import (
            decode_payload,
            decode_payload_pil,
            decode_video_ffmpeg,
        )

        decode = {
            "pil": decode_payload_pil,
            "ffmpeg": decode_video_ffmpeg,
        }.get(decoder, decode_payload)
        for pdf in batches:
            if decoder in ("real", "pil", "ffmpeg"):
                decoded = [decode(bytes(p)) for p in pdf["payload"]]
                pixels = [d[3] for d in decoded]
                n = pd.Series([len(px) for px in pixels], dtype="int64")
            else:
                n = (
                    pdf["meta"].map(
                        lambda m: m["width"] * m["height"] * m["channels"]
                    )
                ).astype("int64")
                pixels = [
                    _fake_pixels(bytes(p), int(k))
                    for p, k in zip(pdf["payload"], n)
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "pixels": pixels,
                    "n_bytes": n.astype("int32"),
                }
            )

    return ensure_min_partitions(media).mapInPandas(run, out_schema)


def byte_histogram(media: DataFrame, n_bins: int = N_HIST_BINS) -> DataFrame:
    """Feature extraction: normalized byte-value histogram of the
    payload → fixed-dim float feature vector. numpy-vectorized per
    Arrow batch; at 100 TB this is the pattern for any per-item
    featurizer (CLIP embedding, mel spectrogram, ...)."""
    import pandas as pd

    # the shift-based binning below is only a partition of 0..255 for
    # power-of-two bin counts — any other value would silently leave
    # the top bins permanently empty (a degenerate feature vector)
    if n_bins <= 0 or n_bins > 256 or n_bins & (n_bins - 1):
        raise ValueError(
            f"n_bins must be a power of two in [1, 256], got {n_bins}"
        )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches):
        # Arrow-native (guide §4.2): the payload column's bytes are
        # already ONE contiguous buffer — a single segmented bincount
        # over (row · n_bins + bin) replaces the per-payload Python
        # loop; identical counts, identical normalization
        import numpy as np

        from ..functions import arrowkit as ak

        shift = 8 - n_bins.bit_length() + 1
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            sch = b.schema
            data, lengths = ak.flat_bytes(
                b.column(sch.get_field_index("payload"))
            )
            row_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
            hist = np.bincount(
                row_idx * n_bins + (data.astype(np.int64) >> shift),
                minlength=n * n_bins,
            ).astype(np.float64).reshape(n, n_bins)
            totals = hist.sum(axis=1, keepdims=True)
            np.divide(hist, totals, out=hist, where=totals > 0)
            yield ak.batch(
                media_id=b.column(sch.get_field_index("media_id")),
                features=ak.list_f64(hist),
            )

    return ensure_min_partitions(media).mapInArrow(run, out_schema)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """'Resize': deterministic nearest-neighbor subsample of the fake
    pixel stream to the target geometry, metadata updated in lockstep.
    (With a real codec this kernel swaps for PIL.resize — same
    signature, same schema.)"""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, p, m in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                src = np.frombuffer(
                    _fake_pixels(bytes(p), m["width"] * m["height"] * m["channels"]),
                    dtype=np.uint8,
                )
                idx = np.linspace(
                    0, len(src) - 1, width * height * m["channels"]
                ).astype(np.int64)
                meta = dict(m)
                meta["width"], meta["height"] = width, height
                rows.append((mid, src[idx].tobytes(), meta))
            yield pd.DataFrame(rows, columns=["media_id", "payload", "meta"])

    return ensure_min_partitions(media).mapInPandas(run, MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame, every_n: int, decoder: str = "fake"
) -> DataFrame:
    """Video frame sampling: one output row per kept frame index
    (0, every_n, 2·every_n, ... < n_frames). The index fan-out is pure
    Spark (posexplode over a sequence — metadata only, no payload
    shuffle); the per-frame payload slice is computed inline.

    ``decoder='ffmpeg'`` swaps the synthetic slice tag for the digest
    of each REAL decoded frame's RGB24 bytes (same output schema, same
    frame-index set — parity asserted in tests when ffmpeg exists);
    the fan-out then happens inside the Arrow kernel, after one decode
    per payload rather than one per kept frame."""
    if decoder == "ffmpeg":
        return _sample_frames_ffmpeg(media, every_n)
    frames = media.select(
        "media_id",
        "payload",
        "meta",
        F.explode(
            F.sequence(
                F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)
            )
        ).alias("frame_idx"),
    )
    # deterministic per-frame "content": a stable slice tag keyed by
    # the payload digest (base64 differs across engines — Spark chunks
    # MIME-style — so key on the hex digest instead); with a real
    # codec this becomes the decoded frame bytes
    return frames.select(
        "media_id",
        "frame_idx",
        F.sha2(
            F.concat(
                F.md5("payload"), F.lit(":"), F.col("frame_idx").cast("string")
            ),
            256,
        ).alias("frame_digest"),
    )


def _sample_frames_ffmpeg(media: DataFrame, every_n: int) -> DataFrame:
    """Real-decode twin of ``sample_frames``: kept frames stream out
    of ffmpeg one at a time (``iter_video_frames`` applies the select
    filter decoder-side, so skipped frames never cross the pipe and
    peak memory is a single frame regardless of clip length). Frame
    indices come from the DECODED stream (the header metadata is
    advisory once real bytes exist). Audio payloads in a mixed media
    table have no visual frames and contribute zero rows — they route
    through ``mel_features``/``decode_wav``, not frame sampling."""
    import hashlib

    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_digest", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.codecs import iter_video_frames, sniff_format

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(p)
                if sniff_format(p) == "wav":
                    continue  # audio: no visual frames to sample
                for idx, frame in iter_video_frames(p, every_n):
                    digest = hashlib.sha256(frame).hexdigest()
                    rows.append((mid, idx, digest))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_digest"]
            )

    return ensure_min_partitions(media).mapInPandas(run, out_schema)


def mel_features(
    media: DataFrame,
    *,
    n_bands: int = 8,
    frame: int = 256,
) -> DataFrame:
    """REAL audio feature extraction over 16-bit PCM WAV payloads —
    the mel-spectrogram-shaped featurizer a training pipeline runs
    before an audio encoder, implemented with numpy FFT inside the
    Arrow kernel (no codec library needed: the WAV codec is the
    stdlib one in ``functions/codecs.py``).

    Per payload: decode PCM → non-overlapping ``frame``-sample
    windows → rFFT power spectrum → ``n_bands`` triangular
    mel-spaced band energies averaged over frames → ``log1p`` →
    e4 fixed-point int64s. Deterministic for a given payload
    (float64 FFT, fixed framing, then quantized), so tests assert
    exact values and tone placement; there is no DuckDB FFT, so this
    is a pytest-verified operator (the S/multimodal tier), not an
    oracled query.

    Scale shape: map-only mapInPandas (one Arrow batch in, one out);
    payload bytes never shuffle. Output: [media_id,
    mel_e4: array<long>] — ``n_bands`` values.
    """
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("mel_e4", T.ArrayType(T.LongType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..functions.codecs import decode_wav

        _fb_cache: dict[int, np.ndarray] = {}

        def mel_filterbank(sr: int) -> np.ndarray:
            # triangular filters on the mel scale over [0, sr/2];
            # depends only on sr (one distinct value per corpus,
            # typically), so built once per rate, not per payload
            cached = _fb_cache.get(sr)
            if cached is not None:
                return cached
            n_bins = frame // 2 + 1
            f_hz = np.linspace(0.0, sr / 2.0, n_bins)
            mel = 2595.0 * np.log10(1.0 + f_hz / 700.0)
            edges = np.linspace(0.0, mel[-1], n_bands + 2)
            fb = np.zeros((n_bands, n_bins))
            for b in range(n_bands):
                lo, mid, hi = edges[b], edges[b + 1], edges[b + 2]
                up = (mel - lo) / max(mid - lo, 1e-12)
                down = (hi - mel) / max(hi - mid, 1e-12)
                fb[b] = np.clip(np.minimum(up, down), 0.0, None)
            _fb_cache[sr] = fb
            return fb

        for pdf in batches:
            ids, feats = [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                n, sr, ch, pcm = decode_wav(bytes(p))
                x = np.frombuffer(pcm, dtype="<i2").astype(np.float64)
                if ch > 1:
                    x = x.reshape(-1, ch).mean(axis=1)
                n_frames = len(x) // frame
                if n_frames == 0:  # pad one short frame
                    x = np.pad(x, (0, frame - len(x)))
                    n_frames = 1
                frames = x[: n_frames * frame].reshape(n_frames, frame)
                power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
                bands = power @ mel_filterbank(sr).T  # (frames, bands)
                e4 = np.floor(np.log1p(bands.mean(axis=0)) * 10000)
                ids.append(mid)
                feats.append(e4.astype(np.int64).tolist())
            yield pd.DataFrame({"media_id": ids, "mel_e4": feats})

    return ensure_min_partitions(media).mapInPandas(run, out_schema)
