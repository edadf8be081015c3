"""Multimodal (image/audio/video) column plumbing — Ray-side real, codecs stubbed.

Media payloads are opaque ``binary`` columns with typed metadata
(media_type, n_bytes, checksum). The decode / feature-extract stages
are actor-pool ``map_batches`` classes whose *Ray plumbing* (schema,
batch sizing, actor signature, output layout) is real and tested, while
the codec itself is pluggable:

* ``decoder="stub"``   → raises ``NotImplementedError`` (the image/audio
  libraries are not available in this environment — a deployment plugs
  PIL/ffmpeg into ``_decode_real``);
* ``decoder="fake"``   → a deterministic fake decoder (seeded from the
  payload checksum) producing stable (height, width, n_frames, feature
  vector) values so downstream layout is exercised end-to-end.

Scale notes: media rows are wide — keep ``batch_size`` small (64) and
let blocks split; the feature vector output is fixed-width float32 so
downstream ANN stages consume it directly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
        ("checksum", pa.string()),
    ]
)

FEATURE_DIM = 16


def synthesize_media(sf_dir: str):
    """Deterministic opaque media table derived from documents' text bytes
    (stand-in payloads; no external data)."""
    import ray.data as rd

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        payloads, types, nbytes, sums = [], [], [], []
        for did, t in zip(ids, batch["text"].to_pylist()):
            payload = (t or "").encode() * 3  # opaque bytes
            payloads.append(payload)
            types.append(["image", "audio", "video"][int(did) % 3])
            nbytes.append(len(payload))
            sums.append(hashlib.md5(payload).hexdigest())
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(types, pa.string()),
                pa.array(payloads, pa.binary()),
                pa.array(nbytes, pa.int64()),
                pa.array(sums, pa.string()),
            ],
            schema=MEDIA_SCHEMA,
        )

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        to_media, batch_format="pyarrow", zero_copy_batch=True
    )


class MediaDecoder:
    """Actor-pool decode/feature stage.

    __init__ loads the (stubbed) codec once per actor; __call__ decodes a
    batch and emits typed features:
    (media_id, media_type, height, width, n_frames, feature: list<float>).
    """

    def __init__(self, decoder: str = "fake"):
        if decoder not in ("fake", "stub"):
            raise ValueError(decoder)
        self.decoder = decoder
        # real deployment: import PIL / av here, once per actor

    def _decode_real(self, media_type: str, payload: bytes):
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg) are not available in this environment; "
            "plug a real decoder here"
        )

    def _decode_fake(self, media_type: str, payload: bytes):
        # dims derive from md5(payload) hex digits — the SAME checksum
        # the manifest records — so the fake decode is a pure function
        # a DuckDB oracle replicates digit-for-digit (the plumbing is
        # value-exact end-to-end even though the codec is a stand-in)
        ck = hashlib.md5(payload).hexdigest()
        h = 16 + int(ck[0:4], 16) % 1008  # [16, 1024)
        w = 16 + int(ck[4:8], 16) % 1008
        frames = 1 if media_type == "image" else 1 + int(ck[8:12], 16) % 299
        rng = np.random.RandomState(int(ck[12:20], 16))
        feat = rng.rand(FEATURE_DIM).astype(np.float32)
        return h, w, frames, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode = self._decode_fake if self.decoder == "fake" else self._decode_real
        hs, ws, fs, feats = [], [], [], []
        for mt, payload in zip(batch["media_type"].to_pylist(), batch["payload"].to_pylist()):
            h, w, nf, feat = decode(mt, payload)
            hs.append(h)
            ws.append(w)
            fs.append(nf)
            feats.append(feat.tolist())
        return pa.Table.from_arrays(
            [
                batch["media_id"],
                batch["media_type"],
                pa.array(hs, pa.int32()),
                pa.array(ws, pa.int32()),
                pa.array(fs, pa.int32()),
                pa.array(feats, pa.list_(pa.float32())),
            ],
            names=["media_id", "media_type", "height", "width", "n_frames", "feature"],
        )


def media_features(sf_dir: str, decoder: str = "fake"):
    """Full multimodal pipeline: synthesize payloads → actor-pool decode.
    Small batches (64) because media rows are wide."""
    return synthesize_media(sf_dir).map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
        zero_copy_batch=True,
    )


class MediaResizer:
    """Actor-pool resize stage: aspect-preserving fit of each medium
    into a ``target``×``target`` box, never upscaling.

    The GEOMETRY is real, vectorized integer math (and therefore
    SQL-oracle-exact): if ``max(h, w) <= target`` the dims pass
    through; else the longest side scales to ``target`` and the other
    scales proportionally with floor division, floored at 1. The pixel
    RESAMPLE itself is the codec plug (``_resample_real`` — PIL/ffmpeg,
    absent here), mirroring :class:`MediaDecoder`'s split between real
    Ray plumbing and stubbed codecs."""

    def __init__(self, target: int = 256):
        if target < 1:
            raise ValueError(f"target must be >= 1, got {target}")
        self.target = target
        # real deployment: import PIL here, once per actor

    def _resample_real(self, payload: bytes, out_h: int, out_w: int) -> bytes:
        raise NotImplementedError(
            "pixel resampling needs PIL/ffmpeg (not in this environment); "
            "plug a real resampler here"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = np.int64(self.target)
        h = batch["height"].to_numpy().astype(np.int64)
        w = batch["width"].to_numpy().astype(np.int64)
        longest = np.maximum(h, w)
        down = longest > t
        out_h = np.where(down, np.maximum(h * t // longest, 1), h)
        out_w = np.where(down, np.maximum(w * t // longest, 1), w)
        out = batch.append_column("out_height", pa.array(out_h.astype(np.int32)))
        return out.append_column("out_width", pa.array(out_w.astype(np.int32)))


class FrameSampler:
    """Actor-pool uniform-stride frame sampling: each medium keeps
    ``k = min(max_frames, n_frames)`` frames at indices
    ``frame_idx(i) = i·n_frames // k`` (i in [0, k)) — the standard
    video-pretraining subsample, a pure function of the row, exploded
    to one output row per kept frame. Whole-batch vectorized
    (repeat + arange; no per-medium Python). The frame EXTRACTION is
    the codec plug, as above."""

    def __init__(self, max_frames: int = 8):
        if max_frames < 1:
            raise ValueError(f"max_frames must be >= 1, got {max_frames}")
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch["n_frames"].to_numpy().astype(np.int64)
        k = np.minimum(n, self.max_frames)
        total = int(k.sum())
        reps = np.repeat(np.arange(len(k), dtype=np.int64), k)
        base = np.concatenate(([0], np.cumsum(k)[:-1])) if len(k) else k
        pos = np.arange(total, dtype=np.int64) - np.repeat(base, k)
        idx = pos * n[reps] // k[reps]
        return pa.Table.from_pydict(
            {
                "media_id": batch["media_id"].take(pa.array(reps)),
                "media_type": batch["media_type"].take(pa.array(reps)),
                "frame_pos": pa.array(pos),
                "frame_idx": pa.array(idx),
            }
        )


def media_resize(sf_dir: str, target: int = 256, decoder: str = "fake"):
    """Decode → resize plan: (media_id, media_type, height, width,
    n_frames, out_height, out_width).

    The geometry stage rides the TASK pool (a pre-constructed callable
    instance), not a second actor pool: stacking fixed-concurrency
    actor pools behind the decoder's pool can reserve every CPU on a
    small cluster and starve the read tasks (observed as a deadlock
    under the 4-CPU test session). A deployment that plugs a real
    resampler should pass the CLASS with its own sized pool instead."""
    return media_features(sf_dir, decoder).drop_columns(["feature"]).map_batches(
        MediaResizer(target=target),
        batch_format="pyarrow",
        batch_size=64,
        zero_copy_batch=True,
    )


def frame_samples(sf_dir: str, max_frames: int = 8, decoder: str = "fake"):
    """Decode → frame sampling: one row per kept frame,
    (media_id, media_type, frame_pos, frame_idx). Task-pool stage —
    see :func:`media_resize` for why."""
    return media_features(sf_dir, decoder).drop_columns(["feature"]).map_batches(
        FrameSampler(max_frames=max_frames),
        batch_format="pyarrow",
        batch_size=64,
        zero_copy_batch=True,
    )
