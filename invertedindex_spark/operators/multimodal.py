"""Multimodal columns for training-data pipelines: images / audio /
video as opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` operators.

The Spark-side plumbing (schemas, batch shapes, partition behaviour,
deterministic outputs) is real and tested; the actual media *decode*
step is stubbed behind an import-gate because no image/audio libraries
exist in this container: with ``decoder="fake"`` (default) a
deterministic content-hash-derived decode stands in, with
``decoder="pil"`` the operator uses Pillow when importable and raises
``NotImplementedError`` otherwise. Swapping the stub for a real decoder
changes one function, not the distributed plan.

Design notes for 100 TB media tables:
* media bytes stay in their own column; metadata-only queries prune it
  at the parquet scan (never read gigabytes to count rows);
* all operators are ``mapInPandas`` — narrow, no shuffle; batch size is
  bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a
  partition of large blobs never materializes at once;
* feature vectors come back as ``array<float>`` ready for the
  similarity-search operators (operators/similarity + entry ANN).
"""

from __future__ import annotations

import hashlib
import struct

MEDIA_SCHEMA = ("media_id long, kind string, media binary, format string, "
                "width int, height int, duration_ms int")

FEATURE_SCHEMA = "media_id long, feature array<float>, feat_dim int"

FRAME_SCHEMA = ("media_id long, frame_idx int, frame binary, "
                "frame_sha256 string")


def synthesize_media(spark, n: int, seed: int = 42, kind: str = "image"):
    """Deterministic fake media table (blob = seeded bytes)."""
    import pandas as pd

    base = spark.range(0, n, 1)

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                blob = hashlib.sha256(
                    f"{kind}:{seed}:{i}".encode()).digest() * (4 + i % 7)
                rows.append((i, kind, blob, "fake",
                             32 + i % 64, 32 + (i * 3) % 64,
                             1000 + i % 5000))
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "media", "format", "width", "height",
                "duration_ms"])

    return base.mapInPandas(gen, MEDIA_SCHEMA)


def _fake_decode_features(blob: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder+embedder: expands the
    sha256 chain seeded by the blob's hex form into `dim` floats in
    [-1, 1). Seeding from hex (injective on content) rather than the
    raw bytes keeps the chain expressible in engines whose sha256 only
    accepts strings (the DuckDB driver oracle)."""
    out = []
    seed = blob.hex()
    while len(out) < dim:
        # chain on the HEX digest, not raw digest bytes: every link
        # must stay reproducible by string-only sha256 engines (the
        # DuckDB oracle) — sha256(hex) → hexdigest → sha256(hex) …
        seed = hashlib.sha256(seed.encode("ascii")).hexdigest()
        h = bytes.fromhex(seed)
        for j in range(0, 32, 4):
            (v,) = struct.unpack(">I", h[j:j + 4])
            out.append((v / 2**31) - 1.0)
            if len(out) == dim:
                break
    return out


def _pil_decode_features(blob: bytes, dim: int) -> list[float]:
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decode requires Pillow, which is not installed "
            "in this environment; use decoder='fake' for the tested "
            "deterministic stand-in") from e
    raise NotImplementedError("wire a real embedder here")


_DECODERS = {"fake": _fake_decode_features, "pil": _pil_decode_features}


def _require_decoder(decoder: str):
    """Driver-side gate: fail fast (unwrapped) when the real decoder's
    library is absent, instead of erroring inside executors."""
    if decoder not in _DECODERS:
        raise ValueError(f"unknown decoder {decoder!r}")
    if decoder == "pil":
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "real image decode requires Pillow, which is not "
                "installed in this environment; use decoder='fake' for "
                "the tested deterministic stand-in") from e


def extract_features(df, dim: int = 64, decoder: str = "fake"):
    """media table → (media_id, feature array<float>, feat_dim)."""
    import pandas as pd

    _require_decoder(decoder)
    decode = _DECODERS[decoder]

    def run(batches):
        for pdf in batches:
            feats = [decode(bytes(b), dim) for b in pdf["media"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "feature": feats,
                "feat_dim": [dim] * len(pdf),
            })

    return df.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(df, every_ms: int = 1000, max_frames: int = 8,
                  decoder: str = "fake"):
    """video rows → one output row per sampled frame. The fake decoder
    slices the blob deterministically; a real one would seek/decode."""
    import pandas as pd

    _require_decoder(decoder)
    if every_ms <= 0:
        raise ValueError("every_ms must be positive")  # driver-side,
    # not a ZeroDivisionError inside executors

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, blob, dur in zip(pdf["media_id"], pdf["media"],
                                      pdf["duration_ms"]):
                blob = bytes(blob)
                n = min(max_frames, max(1, int(dur) // every_ms))
                # never more frames than bytes — a short blob would
                # otherwise emit phantom empty frames (sha of b"")
                n = min(n, len(blob))
                if n == 0:
                    continue
                step = max(1, len(blob) // n)
                for fi in range(n):
                    frame = blob[fi * step:(fi + 1) * step]
                    # hash the hex form (injective) — string-only
                    # sha256 engines (DuckDB oracle) can reproduce it
                    rows.append((int(mid), fi, frame,
                                 hashlib.sha256(
                                     frame.hex().encode("ascii"))
                                 .hexdigest()))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                              "frame", "frame_sha256"])

    return df.mapInPandas(run, FRAME_SCHEMA)


def resize_images(df, width: int = 16, height: int = 16,
                  decoder: str = "fake"):
    """image rows → resized blobs. Fake decoder emits a deterministic
    width*height-byte pseudo-bitmap derived from the source blob."""
    import pandas as pd

    _require_decoder(decoder)

    def run(batches):
        for pdf in batches:
            out = []
            for blob in pdf["media"]:
                blob = bytes(blob)
                need = width * height
                # hex-string sha256 chain (like _fake_decode_features):
                # each step hashes the PREVIOUS HEX DIGEST, so
                # string-only sha256 engines can reproduce the bytes
                h = blob.hex()
                parts = []
                while sum(len(p) for p in parts) < need * 2:
                    h = hashlib.sha256(h.encode("ascii")).hexdigest()
                    parts.append(h)
                out.append(bytes.fromhex("".join(parts)[:need * 2]))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media": out,
                "width": [width] * len(pdf),
                "height": [height] * len(pdf),
            })

    return df.mapInPandas(
        run, "media_id long, media binary, width int, height int")
