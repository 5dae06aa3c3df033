"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference scope. The pattern for image/audio/video at 100 TB:
store the payload as a ``binary`` column (or a reference into object
storage) next to typed metadata; run decode / feature-extraction as
Arrow-batched ``mapInPandas`` stages so bytes stay in columnar batches
end-to-end and Python is entered once per batch, not per row.

The container has no image/audio codecs, so the actual decode is STUBBED:
``decode_blob_meta`` raises NotImplementedError for real formats and the
default ``fake_decoder`` derives deterministic pseudo-metadata from the
payload's md5 — which makes the whole pipeline (schema, batching, UDF
signature) testable and oracle-checkable today, and swap-in ready for a
real codec (replace one function, same plan)."""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Arrow batch -> Arrow batch; schema of the decoded metadata stage.
BLOB_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width bigint, height bigint, format string"
)

Decoder = Callable[[bytes], tuple[int, int, str]]


def decode_blob_meta(blob: bytes) -> tuple[int, int, str]:
    """Real decoder hook — needs an image codec, absent in this container."""
    raise NotImplementedError(
        "image/audio codecs are not available in this environment; "
        "inject a decoder (e.g. PIL-based) or use fake_decoder"
    )


def fake_decoder(blob: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in: dimensions from the payload's md5. Matches
    the DuckDB oracle (md5 over the same bytes) bit for bit."""
    h = hashlib.md5(blob).hexdigest()
    return int(h[:8], 16) % 1024 + 1, int(h[8:16], 16) % 1024 + 1, "fake"


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
