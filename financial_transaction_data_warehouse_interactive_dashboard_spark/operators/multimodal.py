"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference scope. The pattern for image/audio/video at 100 TB:
store the payload as a ``binary`` column (or a reference into object
storage) next to typed metadata; run decode / feature-extraction as
Arrow-batched ``mapInPandas`` stages so bytes stay in columnar batches
end-to-end and Python is entered once per batch, not per row.

``decode_blob_meta`` is a REAL pure-Python header decoder for three
container-friendly formats — BMP (fixed little-endian header offsets),
PPM (ASCII token header, P3/P6), and WAV (RIFF chunk walk) — no codec
libraries needed; pixel/sample PAYLOAD decode beyond the header is out
of scope here (that's where PIL/ffmpeg would slot in). ``fake_decoder``
(deterministic md5 pseudo-metadata) remains for payloads that are not
real media, keeping the pipeline oracle-checkable over arbitrary bytes."""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Arrow batch -> Arrow batch; schema of the decoded metadata stage.
BLOB_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width bigint, height bigint, format string"
)

Decoder = Callable[[bytes], tuple[int, int, str]]


def encode_bmp(width: int, height: int, gray: int = 0) -> bytes:
    """Minimal REAL 24-bit uncompressed BMP writer (BITMAPFILEHEADER +
    BITMAPINFOHEADER + bottom-up BGR rows padded to 4 bytes) — the
    synthesis side of the round-trip test for decode_blob_meta. Pure
    header+buffer arithmetic; any BMP reader opens its output."""
    if width < 1 or height < 1:
        raise ValueError("BMP dimensions must be positive")
    row = width * 3
    pad = (-row) % 4
    img_size = (row + pad) * height
    file_size = 14 + 40 + img_size
    header = struct.pack(
        "<2sIHHI", b"BM", file_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    scanline = bytes((gray & 0xFF,)) * row + b"\x00" * pad
    return header + scanline * height


def _decode_bmp(blob: bytes) -> tuple[int, int, str]:
    if len(blob) < 26:
        raise ValueError("truncated BMP header")
    width, height = struct.unpack_from("<ii", blob, 18)
    # Negative height encodes top-down row order; dimensions are |h|.
    return width, abs(height), "bmp"


def _decode_ppm(blob: bytes) -> tuple[int, int, str]:
    """P3/P6 netpbm header: ASCII tokens (magic, width, height, maxval)
    separated by whitespace, '#' comments running to end-of-line."""
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < len(blob):
        c = blob[pos:pos + 1]
        if c == b"#":
            nl = blob.find(b"\n", pos)
            pos = len(blob) if nl < 0 else nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(blob) and not blob[end:end + 1].isspace():
                end += 1
            tokens.append(blob[pos:end])
            pos = end
    if len(tokens) < 2:
        raise ValueError("truncated PPM header")
    return int(tokens[0]), int(tokens[1]), "ppm"


def _decode_wav(blob: bytes) -> tuple[int, int, str]:
    """RIFF/WAVE chunk walk to the fmt chunk. Maps onto the (width,
    height) metadata slots as (sample_rate, n_channels) — documented
    convention for audio in the shared BLOB_META_SCHEMA."""
    if blob[8:12] != b"WAVE":
        raise ValueError("not a WAVE file")
    pos = 12
    while pos + 8 <= len(blob):
        cid, size = struct.unpack_from("<4sI", blob, pos)
        if cid == b"fmt ":
            channels, rate = struct.unpack_from("<HI", blob, pos + 10)
            return rate, channels, "wav"
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    raise ValueError("no fmt chunk in WAVE file")


def decode_blob_meta(blob: bytes) -> tuple[int, int, str]:
    """Real header decoder: sniffs the payload's magic bytes and parses
    the format's own header structure (no codec libraries). Supported:
    BMP ('BM…', little-endian dword dims at offsets 18/22), PPM
    ('P3'/'P6' ASCII header), WAV ('RIFF…WAVE' fmt chunk →
    (sample_rate, channels)). Raises ValueError on anything else —
    unknown bytes are a data error, not a stub."""
    if blob[:2] == b"BM":
        return _decode_bmp(blob)
    if blob[:2] in (b"P3", b"P6"):
        return _decode_ppm(blob)
    if blob[:4] == b"RIFF":
        return _decode_wav(blob)
    raise ValueError(f"unrecognized media magic: {blob[:4]!r}")


def fake_decoder(blob: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in: dimensions from the payload's md5. Matches
    the DuckDB oracle (md5 over the same bytes) bit for bit."""
    h = hashlib.md5(blob).hexdigest()
    return int(h[:8], 16) % 1024 + 1, int(h[8:16], 16) % 1024 + 1, "fake"


def bmp_roundtrip_meta(docs: DataFrame) -> DataFrame:
    """REAL-FORMAT decode demo: synthesize a genuine 24-bit BMP payload
    per document (dimensions derived from doc_id: w = id%64+1,
    h = id*7%64+1, solid gray id%256) and decode it back by parsing the
    actual BMP header bytes — encoder packs with struct, decoder unpacks
    at the format's fixed offsets, so a mismatch in layout, endianness,
    or row padding breaks the round-trip. The DuckDB oracle recomputes
    (width, height, n_bytes) from doc_id arithmetic alone, so it checks
    the BMP file-size math (54-byte header + 4-byte-aligned scanlines)
    independently of this code path.

    One Arrow-batched mapInPandas stage over a single pruned column;
    encode + decode are defined INSIDE the task closure (stdlib struct
    only) so the task ships self-contained to workers without this repo
    on their import path. Equivalence of the closure copies with the
    module-level encode_bmp/decode_blob_meta API is unit-tested."""

    def run(batches: Iterator) -> Iterator:
        import struct as _st

        import pandas as pd

        def enc(w: int, h: int, gray: int) -> bytes:
            row = w * 3
            pad = (-row) % 4
            img = (row + pad) * h
            head = _st.pack("<2sIHHI", b"BM", 54 + img, 0, 0, 54) + _st.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img, 2835, 2835, 0, 0
            )
            return head + (bytes((gray,)) * row + b"\x00" * pad) * h

        for pdf in batches:
            ids, nb, ws, hs = [], [], [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                blob = enc(i % 64 + 1, i * 7 % 64 + 1, i % 256)
                assert blob[:2] == b"BM"
                w, h = _st.unpack_from("<ii", blob, 18)
                ids.append(i)
                nb.append(len(blob))
                ws.append(w)
                hs.append(abs(h))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_bytes": pd.Series(nb, dtype="int64"),
                    "width": pd.Series(ws, dtype="int64"),
                    "height": pd.Series(hs, dtype="int64"),
                    "format": "bmp",
                }
            )

    return docs.select("doc_id").mapInPandas(run, schema=BLOB_META_SCHEMA)


def attach_blob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: materialize an opaque binary payload column (the
    UTF-8 bytes of ``text``). In production this column arrives from the
    source (parquet BINARY / object-store fetch); nothing downstream
    depends on it being text."""
    return docs.withColumn("blob", F.encode(F.col(text_col), "utf-8"))


def blob_metadata(
    docs_with_blob: DataFrame, decoder: Decoder | None = None
) -> DataFrame:
    """Decode stage: mapInPandas over (doc_id, blob) -> typed metadata.

    Plumbing notes that survive a real decoder swap: input is pruned to
    exactly two columns before entering Python (no full-row pickling);
    batches are pandas/Arrow (spark.sql.execution.arrow.maxRecordsPerBatch
    bounds peak memory when payloads are MBs); output schema is explicit.

    The default decoder is (re)defined INSIDE the task closure: a
    module-level default would be cloudpickled by reference and break on
    executors that don't have this repo on their import path (e.g. the
    external driver's session). Injected decoders must be import-safe on
    workers or defined inline by the caller.
    """

    def run(batches: Iterator) -> Iterator:
        import hashlib as _hl

        import pandas as pd

        def _fake(blob: bytes) -> tuple[int, int, str]:
            h = _hl.md5(blob).hexdigest()
            return int(h[:8], 16) % 1024 + 1, int(h[8:16], 16) % 1024 + 1, "fake"

        dec = decoder or _fake
        for pdf in batches:
            meta = [dec(b) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pdf["blob"].map(len).astype("int64"),
                    "width": pd.Series([m[0] for m in meta], dtype="int64"),
                    "height": pd.Series([m[1] for m in meta], dtype="int64"),
                    "format": [m[2] for m in meta],
                }
            )

    pruned = docs_with_blob.select("doc_id", "blob")
    return pruned.mapInPandas(run, schema=BLOB_META_SCHEMA)


FEATURE_DIM = 16
FEATURES_SCHEMA = (
    "doc_id bigint, features array<double>, out_w bigint, out_h bigint"
)


def extract_features(docs_with_blob: DataFrame, fit: int = 256) -> DataFrame:
    """Feature-extraction + resize-planning stage over the binary payload.

    Real pipeline shape: decode -> embed -> compute the resize geometry,
    one Arrow batch at a time, vector column out (`array<double>` — the
    schema the similarity operators consume). The embedding itself is the
    deterministic md5 stand-in (feature i = md5(blob || '_i') scaled to
    [0,1)); the resize plan is integer arithmetic on the decoded
    dimensions: fit the long side to ``fit`` px, floor-scale the short
    side (integer div — engine-portable, no float rounding).
    """

    def run(batches: Iterator) -> Iterator:
        import hashlib as _hl

        import pandas as pd

        def feats(blob: bytes) -> list[float]:
            out = []
            for i in range(FEATURE_DIM):
                h = _hl.md5(blob + f"_{i}".encode()).hexdigest()
                out.append(int(h[:8], 16) % 1000 / 1000.0)
            return out

        def dims(blob: bytes) -> tuple[int, int]:
            h = _hl.md5(blob).hexdigest()
            return int(h[:8], 16) % 1024 + 1, int(h[8:16], 16) % 1024 + 1

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                w, h = dims(blob)
                if w >= h:
                    out_w, out_h = fit, (h * fit) // w
                else:
                    out_w, out_h = (w * fit) // h, fit
                rows.append((int(doc_id), feats(blob), out_w, out_h))
            yield pd.DataFrame(
                rows, columns=["doc_id", "features", "out_w", "out_h"]
            )

    return docs_with_blob.select("doc_id", "blob").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_md5 string"


def frame_sample(
    docs_with_blob: DataFrame, frame_bytes: int = 64, every: int = 2
) -> DataFrame:
    """Frame-sampling stage: treat the payload as fixed-size frames and
    keep every ``every``-th — the video-keyframe access pattern. One input
    row fans out to many output rows (mapInPandas is a generator over
    batches, so the fan-out never materializes per-document lists on the
    driver)."""

    def run(batches: Iterator) -> Iterator:
        import hashlib as _hl

        import pandas as pd

        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                n = (len(blob) + frame_bytes - 1) // frame_bytes
                for j in range(0, n, every):
                    ids.append(int(doc_id))
                    idxs.append(j)
                    hashes.append(
                        _hl.md5(
                            blob[j * frame_bytes : (j + 1) * frame_bytes]
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": hashes}
            )

    return docs_with_blob.select("doc_id", "blob").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


WAV_FEATURES_SCHEMA = (
    "doc_id bigint, n_samples bigint, sample_rate bigint, duration_us bigint,"
    " peak bigint, rms double, zero_crossings bigint"
)


def wav_pcm_features(docs: DataFrame) -> DataFrame:
    """REAL audio feature extraction: synthesize a genuine PCM16 mono WAV
    per document (sawtooth-ish samples and sample rate derived from
    doc_id), walk the RIFF chunks to the fmt AND data chunks, decode the
    little-endian int16 sample buffer with numpy, and compute the
    standard first-pass audio curation features — peak amplitude, RMS
    level, zero-crossing count, duration. The byte path is load-bearing:
    a wrong chunk offset, endianness, or sample width breaks every
    feature, and the DuckDB oracle recomputes the features from doc_id
    ARITHMETIC alone (never seeing the bytes), so encode and decode must
    both be exact.

    Same plumbing contract as the other decode stages: one Arrow-batched
    mapInPandas over a single pruned column, stdlib+numpy only, codecs
    defined inside the task closure so the task ships self-contained.
    Swap the synthesis for a real payload column and the decode/feature
    path runs unchanged — that is the production shape for audio QC at
    100 TB (map-only, zero shuffle)."""

    def run(batches: Iterator) -> Iterator:
        import math as _math
        import struct as _st

        import numpy as np
        import pandas as pd

        def enc(i: int) -> bytes:
            n = i % 100 + 50
            rate = 8000 + (i % 4) * 4000
            s = (((i * 37 + np.arange(n) * 17) % 2048) - 1024).astype("<i2")
            data = s.tobytes()
            fmt = _st.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
            return (
                b"RIFF"
                + _st.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
                + b"WAVE"
                + b"fmt "
                + _st.pack("<I", len(fmt))
                + fmt
                + b"data"
                + _st.pack("<I", len(data))
                + data
            )

        def dec(blob: bytes):
            assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
            pos, rate, raw = 12, None, None
            while pos + 8 <= len(blob):
                cid, size = _st.unpack_from("<4sI", blob, pos)
                if cid == b"fmt ":
                    rate = _st.unpack_from("<HHI", blob, pos + 8)[2]
                elif cid == b"data":
                    raw = blob[pos + 8 : pos + 8 + size]
                pos += 8 + size + (size & 1)
            s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
            n = len(s)
            sg = np.where(s >= 0, 1, -1)
            return (
                n,
                rate,
                (n * 1_000_000) // rate,
                int(np.max(np.abs(s))),
                round(_math.sqrt(int(np.sum(s * s)) / n), 6),
                int(np.sum(sg[1:] != sg[:-1])),
            )

        for pdf in batches:
            out = {
                k: []
                for k in (
                    "doc_id",
                    "n_samples",
                    "sample_rate",
                    "duration_us",
                    "peak",
                    "rms",
                    "zero_crossings",
                )
            }
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                n, rate, dur, peak, rms, zc = dec(enc(i))
                out["doc_id"].append(i)
                out["n_samples"].append(n)
                out["sample_rate"].append(rate)
                out["duration_us"].append(dur)
                out["peak"].append(peak)
                out["rms"].append(rms)
                out["zero_crossings"].append(zc)
            yield pd.DataFrame(
                {
                    k: pd.Series(
                        v, dtype="float64" if k == "rms" else "int64"
                    )
                    for k, v in out.items()
                }
            )

    return docs.select("doc_id").mapInPandas(run, schema=WAV_FEATURES_SCHEMA)


BMP_PIXEL_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, mean_brightness double,"
    " min_brightness bigint, max_brightness bigint, top_left bigint"
)


def bmp_pixel_features(docs: DataFrame) -> DataFrame:
    """REAL image payload decode: synthesize a 24-bit BMP per document
    whose pixel (x, y) carries gray value (doc_id + 3x + 5y) % 256,
    then decode the PIXEL BUFFER — header offsets, 4-byte scanline
    padding, and the format's bottom-up row order all load-bearing —
    and reduce to brightness statistics. top_left is the decoded value
    at IMAGE coordinate (0, 0), which lives in the LAST stored scanline;
    a decoder that forgets the vertical flip reports pixel (0, h-1)
    there and the oracle (pure doc_id arithmetic, no bytes) catches it.
    Same self-contained Arrow-batched mapInPandas contract as the other
    decode stages; swap the synthesis for a real blob column and the
    decode path is the production image-QC stage."""

    def run(batches: Iterator) -> Iterator:
        import struct as _st

        import numpy as np
        import pandas as pd

        def enc(i: int, w: int, h: int) -> bytes:
            stride = w * 3 + ((-w * 3) % 4)
            x = np.arange(w)
            y = np.arange(h)
            # Image-orientation gradient, then flip to bottom-up storage.
            v = ((i + 3 * x[None, :] + 5 * y[:, None]) % 256)[::-1]
            padded = np.zeros((h, stride), np.uint8)
            padded[:, : w * 3] = np.repeat(v, 3, axis=1)
            img = padded.tobytes()
            head = _st.pack("<2sIHHI", b"BM", 54 + len(img), 0, 0, 54) + _st.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img), 2835, 2835, 0, 0
            )
            return head + img

        def dec(blob: bytes):
            off = _st.unpack_from("<I", blob, 10)[0]
            w, h = _st.unpack_from("<ii", blob, 18)
            h = abs(h)
            stride = w * 3 + ((-w * 3) % 4)
            raw = np.frombuffer(blob, np.uint8, count=stride * h, offset=off)
            # rows stored bottom-up; take the blue channel (all equal),
            # drop padding, flip to image orientation.
            px = raw.reshape(h, stride)[:, : w * 3 : 3][::-1].astype(np.int64)
            return (
                int(px.sum()),
                int(px.min()),
                int(px.max()),
                int(px[0, 0]),
            )

        for pdf in batches:
            cols = {
                k: []
                for k in (
                    "doc_id",
                    "width",
                    "height",
                    "mean_brightness",
                    "min_brightness",
                    "max_brightness",
                    "top_left",
                )
            }
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = i % 64 + 1, i * 7 % 64 + 1
                total, lo, hi, tl = dec(enc(i, w, h))
                cols["doc_id"].append(i)
                cols["width"].append(w)
                cols["height"].append(h)
                cols["mean_brightness"].append(round(total / (w * h), 6))
                cols["min_brightness"].append(lo)
                cols["max_brightness"].append(hi)
                cols["top_left"].append(tl)
            yield pd.DataFrame(
                {
                    k: pd.Series(
                        v,
                        dtype="float64" if k == "mean_brightness" else "int64",
                    )
                    for k, v in cols.items()
                }
            )

    return docs.select("doc_id").mapInPandas(run, schema=BMP_PIXEL_SCHEMA)


AVI_FRAME_SCHEMA = (
    "doc_id bigint, frame_idx bigint, n_frames bigint, width bigint,"
    " height bigint, mean_brightness double, top_left bigint"
)

AVI_SAMPLE_EVERY = 3


def avi_frame_features(docs: DataFrame) -> DataFrame:
    """REAL video container parsing: synthesize a minimal-but-valid AVI
    per document (RIFF 'AVI ' -> LIST 'hdrl' with an avih main header ->
    LIST 'movi' with one '00db' uncompressed DIB chunk per frame), walk
    the nested RIFF structure back out, and emit brightness features for
    every AVI_SAMPLE_EVERY-th frame — the frame-sampling stage a video
    training pipeline runs before any model sees pixels. Frames use the
    DIB scanline layout (4-byte padding, bottom-up rows), so the decoder
    shares the BMP pixel path's obligations; the avih dwTotalFrames
    field is cross-checked against the counted movi chunks, failing
    loudly on any container-walk drift. Same self-contained Arrow
    mapInPandas contract as the image/audio stages."""

    def run(batches: Iterator) -> Iterator:
        import struct as _st

        import numpy as np
        import pandas as pd

        def frame_bytes(i: int, f: int, w: int, h: int) -> bytes:
            stride = w * 3 + ((-w * 3) % 4)
            x = np.arange(w)
            y = np.arange(h)
            # Image-orientation gradient, flipped to bottom-up DIB rows.
            v = ((i + 7 * f + 3 * x[None, :] + 5 * y[:, None]) % 256)[::-1]
            padded = np.zeros((h, stride), np.uint8)
            padded[:, : w * 3] = np.repeat(v, 3, axis=1)
            return padded.tobytes()

        def chunk(cid: bytes, payload: bytes) -> bytes:
            return (
                cid
                + _st.pack("<I", len(payload))
                + payload
                + (b"\x00" if len(payload) & 1 else b"")
            )

        def lst(kind: bytes, payload: bytes) -> bytes:
            return chunk(b"LIST", kind + payload)

        def enc(i: int) -> bytes:
            n_frames = i % 12 + 4
            w, h = i % 16 + 1, (i * 3) % 16 + 1
            avih = _st.pack(
                "<14I", 100000, 0, 0, 0, n_frames, 0, 1, 0, w, h, 0, 0, 0, 0
            )
            hdrl = lst(b"hdrl", chunk(b"avih", avih))
            movi = lst(
                b"movi",
                b"".join(
                    chunk(b"00db", frame_bytes(i, f, w, h))
                    for f in range(n_frames)
                ),
            )
            return chunk(b"RIFF", b"AVI " + hdrl + movi)

        def dec(blob: bytes):
            assert blob[:4] == b"RIFF" and blob[8:12] == b"AVI "
            pos, end = 12, 8 + _st.unpack_from("<I", blob, 4)[0]
            meta, frames = None, []
            while pos + 8 <= end:
                cid, size = _st.unpack_from("<4sI", blob, pos)
                body = blob[pos + 8 : pos + 8 + size]
                if cid == b"LIST":
                    kind, inner = body[:4], body[4:]
                    if kind == b"hdrl":
                        # avih is the first chunk inside hdrl.
                        acid, asize = _st.unpack_from("<4sI", inner, 0)
                        assert acid == b"avih"
                        fields = _st.unpack_from("<14I", inner, 8)
                        meta = (fields[4], fields[8], fields[9])
                    elif kind == b"movi":
                        ip = 0
                        while ip + 8 <= len(inner):
                            fcid, fsize = _st.unpack_from("<4sI", inner, ip)
                            if fcid == b"00db":
                                frames.append(inner[ip + 8 : ip + 8 + fsize])
                            ip += 8 + fsize + (fsize & 1)
                pos += 8 + size + (size & 1)
            n_frames, w, h = meta
            assert n_frames == len(frames), "avih/movi frame-count drift"
            stride = w * 3 + ((-w * 3) % 4)
            out = []
            for f in range(0, n_frames, AVI_SAMPLE_EVERY):
                raw = np.frombuffer(frames[f], np.uint8, count=stride * h)
                px = raw.reshape(h, stride)[:, : w * 3 : 3][::-1].astype(
                    np.int64
                )
                out.append(
                    (
                        f,
                        n_frames,
                        w,
                        h,
                        round(int(px.sum()) / (w * h), 6),
                        int(px[0, 0]),
                    )
                )
            return out

        for pdf in batches:
            cols = {
                k: []
                for k in (
                    "doc_id",
                    "frame_idx",
                    "n_frames",
                    "width",
                    "height",
                    "mean_brightness",
                    "top_left",
                )
            }
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                for f, nf, w, h, mb, tl in dec(enc(i)):
                    cols["doc_id"].append(i)
                    cols["frame_idx"].append(f)
                    cols["n_frames"].append(nf)
                    cols["width"].append(w)
                    cols["height"].append(h)
                    cols["mean_brightness"].append(mb)
                    cols["top_left"].append(tl)
            yield pd.DataFrame(
                {
                    k: pd.Series(
                        v,
                        dtype="float64" if k == "mean_brightness" else "int64",
                    )
                    for k, v in cols.items()
                }
            )

    return docs.select("doc_id").mapInPandas(run, schema=AVI_FRAME_SCHEMA)


AHASH_SCHEMA = (
    "doc_id bigint, width bigint, height bigint,"
    " ahash_hi bigint, ahash_lo bigint"
)


def bmp_ahash(docs: DataFrame) -> DataFrame:
    """Perceptual AVERAGE HASH over decoded BMP pixels — the image
    near-dup primitive (aHash: downsample to an 8x8 block grid, one bit
    per block = block mean above the whole-image mean). Runs the same
    REAL decode as bmp_pixel_features (data offset, scanline padding,
    bottom-up flip), then integer-only hashing: a block's bit compares
    block_sum * total_count > total_sum * block_count — exact cross
    multiplication, no float means — so the 64 bits are engine- and
    platform-deterministic. Images narrower/shorter than 8 px leave
    their unoccupied blocks at 0; a constant image hashes to all-zero
    (nothing exceeds the mean strictly).

    The hash is returned as two 32-bit halves (ahash_hi = blocks 32-63,
    ahash_lo = blocks 0-31) so neither engine touches the BIGINT sign
    bit. Arrow-batched mapInPandas; map-only over doc ids."""

    def run(batches: Iterator) -> Iterator:
        import struct as _st

        import numpy as np
        import pandas as pd

        def enc(i: int, w: int, h: int) -> bytes:
            stride = w * 3 + ((-w * 3) % 4)
            x = np.arange(w)
            y = np.arange(h)
            v = ((i + 3 * x[None, :] + 5 * y[:, None]) % 256)[::-1]
            padded = np.zeros((h, stride), np.uint8)
            padded[:, : w * 3] = np.repeat(v, 3, axis=1)
            img = padded.tobytes()
            head = _st.pack("<2sIHHI", b"BM", 54 + len(img), 0, 0, 54) + _st.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img), 2835, 2835, 0, 0
            )
            return head + img

        def dec(blob: bytes) -> "np.ndarray":
            off = _st.unpack_from("<I", blob, 10)[0]
            w, h = _st.unpack_from("<ii", blob, 18)
            h = abs(h)
            stride = w * 3 + ((-w * 3) % 4)
            raw = np.frombuffer(blob, np.uint8, count=stride * h, offset=off)
            return raw.reshape(h, stride)[:, : w * 3 : 3][::-1].astype(
                np.int64
            )

        def ahash(px: "np.ndarray") -> tuple[int, int]:
            h, w = px.shape
            bx = (np.arange(w) * 8) // w
            by = (np.arange(h) * 8) // h
            blk = (by[:, None] * 8 + bx[None, :]).ravel()
            sums = np.zeros(64, np.int64)
            cnts = np.zeros(64, np.int64)
            np.add.at(sums, blk, px.ravel())
            np.add.at(cnts, blk, 1)
            tsum, tcnt = int(px.sum()), px.size
            hi = lo = 0
            for b in range(64):
                if cnts[b] and int(sums[b]) * tcnt > tsum * int(cnts[b]):
                    if b < 32:
                        lo |= 1 << b
                    else:
                        hi |= 1 << (b - 32)
            return hi, lo

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "width", "height",
                                   "ahash_hi", "ahash_lo")}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = i % 64 + 1, i * 7 % 64 + 1
                hi, lo = ahash(dec(enc(i, w, h)))
                out["doc_id"].append(i)
                out["width"].append(w)
                out["height"].append(h)
                out["ahash_hi"].append(hi)
                out["ahash_lo"].append(lo)
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    return docs.select("doc_id").mapInPandas(run, schema=AHASH_SCHEMA)


def ahash_neardup_stats(
    hashes: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Hamming-BALL image near-dup detection over an aHash frame
    (doc_id, ahash_hi, ahash_lo) — the SimHash band trick
    (operators.dedup.simhash_pairs) applied to the perceptual hash:
    split the 64 bits into 4 x 16-bit bands; by pigeonhole any pair
    within Hamming distance <= 3 shares at least one identical band, so
    the band-bucket equi-join is a LOSSLESS candidate generator (keep
    ``max_hamming`` <= bands - 1 to preserve that) while cutting the
    pair space to same-bucket docs. Candidates are verified by the
    exact XOR popcount over both halves; hamming = 0 (byte-identical
    hashes) is EXCLUDED — exact classes belong to the cluster-bounded
    mm_ahash_clusters shape, and including them here would re-introduce
    the N^2 blow-up on degenerate constant-image classes.

    Output is per-DOCUMENT, not per-pair: (doc_id, n_neardups,
    min_neighbor, min_hamming) over both pair directions — linear in
    the corpus even where near-dup balls are dense (the fixture's
    gradient images produce ~37k raw pairs at sf0.1; a pair listing
    would grow quadratically with corpus density, per-doc stats cannot).

    Scale: ONE shuffle on the (band, key) bucket join + one on the
    per-doc aggregate; buckets with skewed sizes (the all-zero-hash
    band of tiny/constant images) are the residual hot spot — the
    production knob is a stop-bucket cap like dedup's stop-shingle
    filter, deliberately NOT defaulted here because it trades recall
    on exactly the degenerate classes a planted-control probe rides."""
    bands = hashes.select(
        "doc_id",
        "ahash_hi",
        "ahash_lo",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), b -> struct(b AS band,"
                " CASE WHEN b < 2"
                " THEN shiftright(ahash_lo, b * 16) % 65536"
                " ELSE shiftright(ahash_hi, (b - 2) * 16) % 65536"
                " END AS key))"
            )
        ).alias("bk"),
    ).select("doc_id", "ahash_hi", "ahash_lo", "bk.band", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            (
                F.bit_count(
                    F.col("a.ahash_hi").bitwiseXOR(F.col("b.ahash_hi"))
                )
                + F.bit_count(
                    F.col("a.ahash_lo").bitwiseXOR(F.col("b.ahash_lo"))
                )
            ).alias("hamming"),
        )
        .distinct()
        .filter(
            (F.col("hamming") >= 1) & (F.col("hamming") <= max_hamming)
        )
    )
    both = pairs.select(
        F.col("id_a").alias("doc_id"),
        F.col("id_b").alias("neighbor"),
        "hamming",
    ).unionAll(
        pairs.select(
            F.col("id_b").alias("doc_id"),
            F.col("id_a").alias("neighbor"),
            "hamming",
        )
    )
    return both.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_neardups"),
        F.min("neighbor").cast("bigint").alias("min_neighbor"),
        F.min("hamming").cast("int").alias("min_hamming"),
    )
