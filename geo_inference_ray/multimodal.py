"""Multimodal columns: opaque binary payloads (image/audio/video) with
typed metadata, processed by actor-pool map_batches stages.

Build-brief contract: the decode libraries are not in this container, so
the decode kernels are STUBBED behind ``DecodeUnavailable`` /
deterministic fakes — but the Ray-side plumbing (schema, batch sizing,
actor signature, output layout) is real and tested.

Schema convention for a multimodal table:
    id:int64, kind:string('image'|'audio'|'video'),
    payload:binary, meta:string(JSON: {width,height,codec,...})

Scale notes: payloads are large -> small ``batch_size`` (default 64)
and ``num_cpus`` per decode actor; blocks carrying payloads should come
straight from ``read_parquet`` and never pass through a shuffle — all
derived features are emitted WITHOUT the payload column.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa


class DecodeUnavailable(NotImplementedError):
    """Raised by real decode paths in this container (no PIL/ffmpeg)."""


def synth_media_batch(batch: pa.Table) -> pa.Table:
    """Deterministic fake media table from documents rows (for tests):
    payload = seeded pseudo-random bytes, meta = fake dimensions."""
    ids = batch["doc_id"].to_numpy()
    kinds = np.where(ids % 3 == 0, "image",
                     np.where(ids % 3 == 1, "audio", "video"))
    payloads = []
    metas = []
    for i, k in zip(ids.tolist(), kinds.tolist()):
        seed = hashlib.blake2b(f"media-{i}".encode(),
                               digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(seed, "little"))
        n = 256 + int(i) % 512
        payloads.append(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
        metas.append(json.dumps({"kind": k, "w": 16 + int(i) % 16,
                                 "h": 16 + int(i) % 8, "n_bytes": n},
                                sort_keys=True))
    return pa.table({
        "id": pa.array(ids), "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "meta": pa.array(metas, pa.string()),
    })


def media_dataset(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return ds.map_batches(synth_media_batch, batch_format="pyarrow",
                          batch_size=256)


class ImageDecoder:
    """Actor-pool decode stage.  Real path: PIL/libjpeg in __init__ —
    STUBBED here (DecodeUnavailable); ``fake=True`` runs a deterministic
    stand-in (bytes -> normalized grayscale grid from meta dims) so the
    plumbing is testable end-to-end."""

    def __init__(self, fake: bool = True, out_size: int = 8):
        self.fake = fake
        self.out_size = out_size
        if not fake:
            raise DecodeUnavailable(
                "image decode requires PIL/libjpeg — not in this container")

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        ids = batch["id"].to_numpy()
        for payload, meta in zip(batch["payload"].to_pylist(),
                                 batch["meta"].to_pylist()):
            m = json.loads(meta)
            arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
            side = self.out_size
            # deterministic fake "decode + resize": fold bytes into a grid
            need = side * side
            reps = -(-need // len(arr))
            grid = np.tile(arr, reps)[:need].reshape(side, side) / 255.0
            feats.append(grid.reshape(-1))
        return pa.table({
            "id": pa.array(ids),
            "kind": batch["kind"],
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32(),
                                         self.out_size * self.out_size)),
        })


class AudioFrameSampler:
    """Frame-sampling stage: emits every k-th fixed-size frame of the
    payload as its own row (flat_map shape) — the video/audio analog of
    tile extraction.  Real codec path stubbed; byte-frame math is real."""

    def __init__(self, frame_bytes: int = 64, every_k: int = 2):
        self.frame_bytes = frame_bytes
        self.every_k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, frame_idx, frames = [], [], []
        for i, payload in zip(batch["id"].to_pylist(),
                              batch["payload"].to_pylist()):
            n = len(payload) // self.frame_bytes
            for f in range(0, n, self.every_k):
                ids_out.append(i)
                frame_idx.append(f)
                frames.append(payload[f * self.frame_bytes:
                                      (f + 1) * self.frame_bytes])
        return pa.table({
            "id": pa.array(ids_out, pa.int64()),
            "frame_idx": pa.array(frame_idx, pa.int64()),
            "frame": pa.array(frames, pa.binary()),
        })


def media_features(sf_dir: str, out_size: int = 8):
    """media -> per-item decoded feature vectors (fake decode), payload
    column dropped before any further stage."""
    ds = media_dataset(sf_dir)
    return ds.map_batches(ImageDecoder, batch_format="pyarrow",
                          batch_size=64, concurrency=(1, 4),
                          fn_constructor_kwargs={"fake": True,
                                                 "out_size": out_size})


def media_frames(sf_dir: str):
    """media -> sampled frames (one row per frame)."""
    ds = media_dataset(sf_dir)
    return ds.map_batches(AudioFrameSampler, batch_format="pyarrow",
                          batch_size=64, concurrency=(1, 4))
