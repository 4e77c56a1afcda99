"""Multimodal asset columns: image/audio/video as opaque BINARY + typed
metadata, processed through Arrow-batched pandas stages.

The Spark-side plumbing — schema, Arrow batch shape, partition sizing,
output contracts — is real and tested. The codec innards (actual JPEG/PCM/
H.264 decode) are STUBBED behind ``_decode_stub`` because the sandbox has
no imaging/audio libraries: the stub derives deterministic pseudo-features
from the bytes (md5-seeded), so every pipeline property (schemas, shapes,
determinism, partitioning) is exercised end-to-end. Swapping the stub for
PIL/librosa/pyav changes ONE function.

Asset schema (the `pages.html` pattern generalized):

    assets(asset_id BIGINT, kind STRING in {image,audio,video},
           data BINARY, meta MAP<STRING,STRING>)

Arrow batches stay small (session.py caps maxRecordsPerBatch) because
asset rows are MB-scale — same G1-humongous-allocation guard as html.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, kind string, data binary, meta map<string,string>"
)

FEATURE_DIM = 16


def _decode_stub(data: bytes, kind: str) -> dict:
    """STUB — stands in for the real decoder (PIL / librosa / pyav).

    Raises for unknown kinds exactly as a real codec registry would;
    produces deterministic md5-derived pseudo-metadata so downstream
    plumbing is testable byte-for-byte. The hash runs over the
    lowercase-HEX rendering of the payload (not the raw bytes) so the
    DuckDB oracle — whose ``md5()`` only accepts VARCHAR — can recompute
    every value from the persisted parquet via ``md5(lower(hex(data)))``.
    """
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no codec for asset kind {kind!r}")
    m = hashlib.md5(data.hex().encode()).hexdigest()
    h0, h1 = int(m[0:2], 16), int(m[2:4], 16)
    if kind == "image":
        return {"width": 64 + h0 % 192, "height": 64 + h1 % 192, "channels": 3}
    if kind == "audio":
        return {"sample_rate": 8000 * (1 + h0 % 6), "n_samples": len(data) * 4,
                "channels": 1 + h1 % 2}
    return {"fps": 24 + h0 % 6, "n_frames": 1 + h1, "width": 320, "height": 240}


def _features_stub(data: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """STUB feature extractor: dim floats derived from a rolling md5 chain
    over the hex rendering (oracle-portable, see ``_decode_stub``) — the
    real model call (CLIP/wav2vec/...) drops in here unchanged."""
    out: list[float] = []
    m = data.hex()
    while len(out) < dim:
        m = hashlib.md5(m.encode()).hexdigest()
        for i in range(0, 32, 8):
            u = int.from_bytes(bytes.fromhex(m[i : i + 8]), "little")
            out.append(round(u / 2**32 * 2.0 - 1.0, 4))
    return out[:dim]


def decode_assets(assets: DataFrame) -> DataFrame:
    """(asset_id, kind, decoded metadata columns) via mapInPandas.

    Only (asset_id, kind, data) crosses the Arrow boundary — meta is not
    needed for decode, and column pruning keeps it out of the scan.
    """
    src = assets.select("asset_id", "kind", "data")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, kind, data in zip(pdf["asset_id"], pdf["kind"], pdf["data"]):
                m = _decode_stub(bytes(data), kind)
                rows.append(
                    (int(aid), kind, int(m.get("width", 0)), int(m.get("height", 0)),
                     int(m.get("sample_rate", 0)), int(m.get("n_frames", 0)))
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "kind", "width", "height", "sample_rate",
                         "n_frames"],
            )

    return src.mapInPandas(
        run,
        schema="asset_id long, kind string, width int, height int, "
               "sample_rate int, n_frames int",
    )


def extract_features(assets: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """(asset_id, embedding ARRAY<FLOAT>) — the ANN-ready feature column;
    feeds operators/similarity.py directly."""
    src = assets.select("asset_id", "data")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64"),
                    "embedding": [
                        _features_stub(bytes(d), dim) for d in pdf["data"]
                    ],
                }
            )

    return src.mapInPandas(run, schema="asset_id long, embedding array<float>")


def frame_sample(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """video → one row per sampled frame (explode pattern). The STUB
    synthesizes frame descriptors from the decode metadata; a real
    implementation yields decoded frame bytes from the same iterator."""
    vids = assets.where(F.col("kind") == "video").select("asset_id", "kind", "data")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, kind, data in zip(pdf["asset_id"], pdf["kind"], pdf["data"]):
                meta = _decode_stub(bytes(data), kind)
                hx = bytes(data).hex()
                for f in range(0, int(meta["n_frames"]), every_n):
                    rows.append((int(aid), f, hashlib.md5(
                        f"{hx}|{f}".encode()).hexdigest()))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "frame_key"])

    return vids.mapInPandas(
        run, schema="asset_id long, frame_idx int, frame_key string"
    )


def persist_assets_parquet(spark, path: str, n: int = 120, seed: int = 42) -> str:
    """Write the deterministic asset fixture to parquet (overwrite) so the
    DuckDB oracle twins can recompute decode/feature/frame values from the
    EXACT same rows via ``read_parquet``. Overwritten on every call — 120
    tiny rows — so the oracle can never read a stale fixture."""
    generate_assets_df(spark, n, seed).write.mode("overwrite").parquet(path)
    return path


def generate_assets_df(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic binary-asset fixture (no external data): payload bytes
    derive from the asset id, sizes vary 1-64 KB."""
    import random

    rows = []
    for i in range(n):
        rng = random.Random(i * 7919 + seed)
        kind = ("image", "audio", "video")[i % 3]
        size = rng.randint(1024, 65536)
        data = hashlib.md5(str((i, seed)).encode()).digest() * (size // 16 + 1)
        rows.append((i, kind, bytes(data[:size]), {"source": f"synthetic/{i}"}))
    return spark.createDataFrame(rows, ASSET_SCHEMA)
