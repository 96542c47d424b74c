"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are ``binary`` columns moved through actor-pool
``map_batches`` stages with SMALL batch sizes (a batch × concurrency
must fit the worker heap — large payloads mean batch_size in the tens,
not thousands). The Ray-side plumbing (schemas, actor signatures,
batch sizing, output layout) is real and tested; the codec itself is
STUBBED: the decode libraries (PIL/ffmpeg/librosa) are not in this
container, so ``decode_backend="fake"`` produces deterministic
hash-derived dimensions/features, and ``decode_backend="real"`` raises
NotImplementedError at actor construction until a codec is installed.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ray.data import Dataset

MEDIA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("media_type", pa.string()),  # image/jpeg, audio/..., video/...
        ("payload", pa.large_binary()),
    ]
)

MEDIA_FEATURES = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("media_type", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("feature", pa.list_(pa.float32())),
    ]
)


@dataclass
class DecodeConfig:
    backend: str = "fake"  # fake | real
    feature_dim: int = 16
    resize_to: int = 64  # target square size for the (stubbed) resize


def _fake_decode(payload: bytes, feature_dim: int) -> tuple[int, int, int, np.ndarray]:
    """Deterministic stand-in for a codec: dims + features from a hash."""
    import hashlib

    digest = hashlib.blake2b(payload, digest_size=32).digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
    w = 32 + digest[8] % 224
    h = 32 + digest[9] % 224
    n_frames = 1 + digest[10] % 4
    feat = rng.standard_normal(feature_dim).astype(np.float32)
    return w, h, n_frames, feat


def sniff_media_header(payload: bytes) -> tuple[str, int, int]:
    """Codec-free container sniff: (format, width, height) parsed from
    the leading bytes of REAL PNG / GIF / JPEG payloads — pure struct
    reads, no image library. This is NOT a stub: it works on genuine
    image bytes today; only pixel decode / feature extraction needs the
    absent codec. Unknown/truncated payloads → ("unknown", 0, 0)."""
    import struct

    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        # IHDR is mandatory-first: width/height big-endian at 16..24.
        # The PNG spec caps both at 2^31-1; larger values are corrupt
        # bytes behind a valid magic — report the container with zeroed
        # dims rather than overflowing the int32 output column.
        w, h = struct.unpack(">II", payload[16:24])
        if w >= 1 << 31 or h >= 1 << 31:
            return "png", 0, 0
        return "png", w, h
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return "gif", w, h
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        # walk JPEG segments to the first SOF0/1/2 frame header
        i = 2
        n = len(payload)
        while i + 9 <= n and payload[i] == 0xFF:
            marker = payload[i + 1]
            if marker == 0xFF:
                i += 1  # legal fill byte before a marker (T.81 B.1.1.2)
                continue
            if marker in (0xC0, 0xC1, 0xC2):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return "jpeg", w, h
            if marker == 0xD9:
                break  # EOI: no frame header seen
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return "jpeg", 0, 0
    return "unknown", 0, 0


class SniffMediaHeaders:
    """Stateless map_batches stage: MEDIA batch → (doc_id, media_ref,
    format, width, height) via ``sniff_media_header`` — the codec-free
    slice of media introspection that runs on real bytes today."""

    def __call__(self, t: pa.Table) -> pa.Table:
        fmts, ws, hs = [], [], []
        for payload in t["payload"].to_pylist():
            f, w, h = sniff_media_header(payload or b"")
            fmts.append(f)
            ws.append(w)
            hs.append(h)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "media_ref": t["media_ref"],
                "format": pa.array(fmts, pa.string()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
            }
        )


class DecodeMedia:
    """Actor-pool stage: MEDIA batch → MEDIA_FEATURES batch.

    Actor ``__init__`` is where a real backend would load its model /
    codec ONCE; ``__call__`` decodes per batch. Use
    ``map_batches(DecodeMedia, fn_constructor_args=(cfg,),
    concurrency=(1, N), batch_size=32, num_cpus=1)``.
    """

    def __init__(self, cfg: DecodeConfig | None = None):
        self.cfg = cfg or DecodeConfig()
        if self.cfg.backend == "real":
            raise NotImplementedError(
                "no image/audio codec ships in this container; install PIL/ffmpeg "
                "and implement DecodeMedia.backend='real'"
            )
        if self.cfg.backend != "fake":
            raise ValueError(f"unknown decode backend {self.cfg.backend!r}")

    def __call__(self, t: pa.Table) -> pa.Table:
        ws, hs, fs, feats = [], [], [], []
        for payload in t["payload"].to_pylist():
            w, h, n, feat = _fake_decode(payload or b"", self.cfg.feature_dim)
            ws.append(w)
            hs.append(h)
            fs.append(n)
            feats.append(feat.tolist())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "media_ref": t["media_ref"],
                "media_type": t["media_type"],
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "n_frames": pa.array(fs, pa.int32()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            },
            schema=MEDIA_FEATURES,
        )


def decode_media(ds: Dataset, cfg: DecodeConfig | None = None, concurrency=(1, 4)) -> Dataset:
    return ds.map_batches(
        DecodeMedia,
        fn_constructor_args=(cfg or DecodeConfig(),),
        batch_format="pyarrow",
        batch_size=32,  # binary payloads: keep batches small (memory-aware)
        concurrency=concurrency,
        num_cpus=0.5,
    )


class ResizeMedia:
    """Actor-pool resize stage: MEDIA batch → MEDIA + resized dims.

    Fake backend computes the scaled geometry (longest side →
    ``resize_to``, aspect preserved, never upscaled) from the decoded
    dims and passes the payload through; a real backend would re-encode
    the pixels in ``__call__`` with the codec loaded in ``__init__``.
    """

    def __init__(self, cfg: DecodeConfig | None = None):
        self.cfg = cfg or DecodeConfig()
        if self.cfg.backend == "real":
            raise NotImplementedError(
                "no image codec ships in this container; install PIL and "
                "implement ResizeMedia.backend='real'"
            )
        if self.cfg.backend != "fake":
            raise ValueError(f"unknown decode backend {self.cfg.backend!r}")

    def __call__(self, t: pa.Table) -> pa.Table:
        target = self.cfg.resize_to
        ws, hs = [], []
        for payload in t["payload"].to_pylist():
            w, h, _n, _f = _fake_decode(payload or b"", 1)
            longest = max(w, h)
            scale = min(1.0, target / longest)
            ws.append(max(1, round(w * scale)))
            hs.append(max(1, round(h * scale)))
        return (
            t.append_column("resized_width", pa.array(ws, pa.int32()))
            .append_column("resized_height", pa.array(hs, pa.int32()))
        )


def resize_media(ds: Dataset, cfg: DecodeConfig | None = None, concurrency=(1, 4)) -> Dataset:
    return ds.map_batches(
        ResizeMedia,
        fn_constructor_args=(cfg or DecodeConfig(),),
        batch_format="pyarrow",
        batch_size=32,
        concurrency=concurrency,
        num_cpus=0.5,
    )


def frame_sample(ds: Dataset, every_nth: int = 2) -> Dataset:
    """Stub frame sampler: keeps metadata plumbing honest — emits one row
    per sampled frame index (a real impl would cut video payloads)."""

    def explode(t: pa.Table) -> pa.Table:
        rows = t.to_pylist()
        out = []
        for r in rows:
            for f in range(0, r["n_frames"], every_nth):
                out.append({**r, "frame_index": f})
        if not out:
            return t.append_column("frame_index", pa.array([], pa.int32()))
        return pa.Table.from_pylist(out)

    return ds.map_batches(explode, batch_format="pyarrow")
