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
