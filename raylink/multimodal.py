"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata, processed
by actor-pool ``map_batches`` stages — the same stateful-stage shape as the
HTML extractor. The actual codec decode is STUBBED (no image/audio libraries
in this container): ``DecoderPool(codec="real")`` raises NotImplementedError
at the decode step, while ``codec="fake"`` runs a deterministic stand-in
(blake2-derived feature vector) so the Ray-side plumbing — schema, batch
sizing, actor signature, output layout — is real and tested.

Scale notes: media rows are wide; callers should size ``batch_size`` small
(payload_bytes * batch_size * concurrency must fit worker heap) and write
outputs partitioned by input shard. ``media_dataset`` is the deterministic
synthetic source used by tests/bench. Reference parity: opaque binary
block parsing behind a typed schema (lib_ebm/pyebmreader.py:159-170) with
per-worker decoder state (lib_adicht/convert.py:59-88).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("sample_rate", pa.int32()),
        pa.field("n_frames", pa.int32()),
    ]
)

FEATURES_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),
        pa.field("feature", pa.list_(pa.float32())),
        pa.field("decode_ok", pa.bool_()),
    ]
)

_KINDS = ("image", "audio", "video")


def synth_payload(i: int, size: int = 2048) -> bytes:
    h = hashlib.blake2b(f"media:{i}".encode(), digest_size=32).digest()
    return (h * (size // 32 + 1))[:size]


def media_table(n: int, payload_bytes: int = 2048) -> pa.Table:
    """Deterministic synthetic media table (pure function of index)."""
    kinds = [_KINDS[i % 3] for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array([synth_payload(i, payload_bytes) for i in range(n)],
                                pa.binary()),
            "width": pa.array([64 + (i % 8) * 16 for i in range(n)], pa.int32()),
            "height": pa.array([64 for _ in range(n)], pa.int32()),
            "sample_rate": pa.array([16000 for _ in range(n)], pa.int32()),
            "n_frames": pa.array([1 + i % 30 for i in range(n)], pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def media_dataset(n: int, *, payload_bytes: int = 2048, parallelism: int = 8):
    tabs = []
    step = max(1, -(-n // parallelism))
    # simple driver-side split; payloads are synthesized inside read via
    # from_arrow for test scale (media sources at real scale are
    # read_binary_files / read_parquet of payload shards)
    return rd.from_arrow(media_table(n, payload_bytes)).repartition(parallelism)


class DecoderPool:
    """Actor-pool stage: media rows -> fixed-size feature vectors.

    ``codec="real"`` is the integration point for PIL/ffmpeg-style decoders
    — NOT AVAILABLE in this container, raises NotImplementedError.
    ``codec="fake"`` derives a deterministic 16-dim float32 vector from the
    payload bytes, exercising the identical dataflow."""

    DIM = 16

    def __init__(self, codec: str = "fake") -> None:
        self.codec = codec

    def _decode_real(self, payload: bytes, kind: str) -> np.ndarray:
        raise NotImplementedError(
            "real media decode requires PIL/soundfile/ffmpeg; not present "
            "in this environment — use codec='fake' for plumbing tests"
        )

    def _decode_fake(self, payload: bytes, kind: str) -> np.ndarray:
        h = hashlib.blake2b(payload, digest_size=self.DIM * 4).digest()
        return np.frombuffer(h, dtype=np.uint32).astype(np.float32) / 2**32

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode = self._decode_real if self.codec == "real" else self._decode_fake
        feats, oks = [], []
        for i in range(batch.num_rows):
            try:
                feats.append(decode(batch["payload"][i].as_py(),
                                    batch["kind"][i].as_py()))
                oks.append(True)
            except NotImplementedError:
                raise
            except Exception:
                feats.append(np.zeros(self.DIM, np.float32))
                oks.append(False)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "feature": pa.array([f.tolist() for f in feats],
                                    pa.list_(pa.float32())),
                "decode_ok": pa.array(oks, pa.bool_()),
            },
            schema=FEATURES_SCHEMA,
        )


def extract_features(media: rd.Dataset, *, codec: str = "fake",
                     batch_size: int = 64, concurrency=(2, 4)) -> rd.Dataset:
    """media -> features via the decoder actor pool. Small batch_size by
    design: wide binary rows (SURVEY §7.6 risk 5)."""
    return media.map_batches(
        DecoderPool, fn_constructor_kwargs={"codec": codec},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency,
    )


def frame_sample(media: rd.Dataset, every_k: int = 5) -> rd.Dataset:
    """Video rows -> one row per sampled frame index (flat_map analog done
    vectorized: repeat rows by ceil(n_frames/k) with frame_idx column)."""

    def f(batch: pa.Table) -> pa.Table:
        nf = batch["n_frames"].to_numpy(zero_copy_only=False)
        counts = np.maximum(1, -(-nf // every_k))
        idx = np.repeat(np.arange(len(nf), dtype=np.int64), counts)
        frame_idx = np.concatenate([
            np.arange(0, n, every_k, dtype=np.int64)[:c]
            for n, c in zip(np.maximum(nf, 1), counts)
        ]) if len(nf) else np.array([], np.int64)
        taken = batch.select(["media_id", "kind"]).take(pa.array(idx))
        return taken.append_column("frame_idx", pa.array(frame_idx, pa.int64()))

    return media.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


class ResizePool:
    """Actor-pool stage: image/video rows -> resized payloads + updated
    metadata. The pixel resample itself is the stubbed codec step
    (``codec="real"`` raises, same contract as DecoderPool); ``"fake"``
    deterministically re-derives a payload of the target byte size so the
    metadata/dataflow — new width/height columns, payload replacement,
    small-batch actor pool — is real and tested."""

    def __init__(self, target_w: int = 32, target_h: int = 32,
                 codec: str = "fake") -> None:
        self.w, self.h, self.codec = target_w, target_h, codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.codec == "real":
            raise NotImplementedError(
                "real resize requires PIL/ffmpeg; use codec='fake'")
        out_payload = []
        for i in range(batch.num_rows):
            src = batch["payload"][i].as_py()
            size = max(32, self.w * self.h // 8)
            h = hashlib.blake2b(src, digest_size=32).digest()
            out_payload.append((h * (size // 32 + 1))[:size])
        n = batch.num_rows
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "payload": pa.array(out_payload, pa.binary()),
            "width": pa.array(np.full(n, self.w, np.int32), pa.int32()),
            "height": pa.array(np.full(n, self.h, np.int32), pa.int32()),
            "sample_rate": batch["sample_rate"],
            "n_frames": batch["n_frames"],
        }, schema=MEDIA_SCHEMA)


def resize_media(media: rd.Dataset, *, target_w: int = 32, target_h: int = 32,
                 codec: str = "fake", batch_size: int = 64,
                 concurrency=(2, 4)) -> rd.Dataset:
    return media.map_batches(
        ResizePool, fn_constructor_kwargs={"target_w": target_w,
                                           "target_h": target_h,
                                           "codec": codec},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency,
    )
