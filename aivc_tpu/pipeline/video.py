"""Sequence-level encode / decode / evaluate.

Mirrors the reference orchestration semantics (reference:
src/model_mngt/model_management.py:31-241, src/real_life/encode.py:23-176,
src/real_life/decode.py:44-326): the sequence is split into consecutive
GOPs of len(gop_struct) frames, the last GOP is padded by repeating the
final frame (img_processing.py:155-174), frames are coded in coding order
with references taken from the codec's own decoded output (closed loop),
and the muxed video bitstream is fully self-describing (video header +
GOP headers carry everything the decoder needs, decode.py:89-124).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from aivc_tpu.coding import bitstream as bs
from aivc_tpu.config import CodingConfig
from aivc_tpu.gop import GopStruct, generate_gop_struct
from aivc_tpu.pipeline.codec import DecodedFrame, FrameCodec


@dataclass
class FrameResult:
    idx: int
    frame_type: int
    bytes: int
    mode_bytes: int
    codec_bytes: int
    alpha_mean: float
    beta_mean: float
    bpp: float
    # Analytic bits under the coder's own quantized CDFs (0.0 unless the
    # codec runs with audit=True); real-vs-analytic overhead mirrors the
    # reference's sequence report (src/real_life/encode.py:153-170).
    analytic_bits: float = 0.0


@dataclass
class EncodeResult:
    bitstream: bytes
    frame_results: List[FrameResult]
    decoded_frames: Dict[int, DecodedFrame]
    fps: float

    @property
    def total_bytes(self) -> int:
        return len(self.bitstream)


def _ref(decoded: Dict[int, "DecodedFrame"], idx: Optional[int]):
    """Device-side 444 reference of an already-decoded frame (or None)."""
    return None if idx is None else decoded[idx].ref


def wave_groups(gop: GopStruct, max_batch: int):
    """Deterministic batched schedule: wave -> split by frame type ->
    chunks of at most max_batch, coding order preserved inside a group.

    Both encoder and decoder derive this grouping from the GOP structure
    alone — it is part of the bit-exactness contract, since XLA may round
    floats differently per batch size.
    """
    groups = []
    for wave in gop.waves():
        by_type: Dict[int, list] = {}
        for f in sorted(wave, key=lambda f: f.coding_order):
            by_type.setdefault(f.frame_type, []).append(f)
        for ftype in sorted(by_type):
            specs = by_type[ftype]
            for i in range(0, len(specs), max_batch):
                groups.append((ftype, specs[i:i + max_batch]))
    return groups


def encode_gop(codec: FrameCodec, gop: GopStruct,
               frames_u8: Sequence[Dict[str, np.ndarray]],
               idx_rate: float, first_idx: int,
               results: List[FrameResult], wave_batch: int = 1):
    """Encode one GOP (frames given in display order for this GOP).

    wave_batch > 1 codes whole temporal waves as device batches — the
    parallelism the reference leaves on the table ("no parallel coding of
    frame at the same temporal layer", reference: decode.py:119-121).
    Returns (packed GOP bytes, decoded frames by absolute index).
    """
    decoded: Dict[int, DecodedFrame] = {}
    frame_bytes_by_order: Dict[int, bytes] = {}
    n_pix = codec.h * codec.w

    # Software pipeline: the encoder's device graph never waits on host
    # range coding — references flow between waves entirely on-device —
    # so device work for upcoming waves can be launched ahead while the
    # host entropy-codes earlier ones.  Lookahead > 0 requires a runtime
    # that buffers multiple in-flight programs; the remote-relay TPU
    # backend used in CI deadlocks on it, so it is opt-in
    # (AIVC_PIPELINE_LOOKAHEAD=2 on real hardware).
    import os
    from collections import deque

    LOOKAHEAD = int(os.environ.get("AIVC_PIPELINE_LOOKAHEAD", "0"))

    inflight = deque()

    def _finish_one():
        specs, handles = inflight.popleft()
        fbs, _, stats = codec.encode_frames_finish(handles)
        for spec, fb, st in zip(specs, fbs, stats):
            frame_bytes_by_order[spec.coding_order] = fb
            results.append(FrameResult(
                idx=first_idx + spec.idx, frame_type=spec.frame_type,
                bytes=st["bytes"], mode_bytes=st["mode_bytes"],
                codec_bytes=st["codec_bytes"], alpha_mean=st["alpha_mean"],
                beta_mean=st["beta_mean"], bpp=st["bytes"] * 8.0 / n_pix,
                analytic_bits=st.get("analytic_bits", 0.0)))

    for ftype, specs in wave_groups(gop, max(1, wave_batch)):
        handles = codec.encode_frames_launch(
            [frames_u8[s.idx] for s in specs],
            [_ref(decoded, s.prev_ref) for s in specs],
            [_ref(decoded, s.next_ref) for s in specs],
            ftype, idx_rate)
        for spec, dec in zip(specs, handles["decoded"]):
            decoded[spec.idx] = dec
        inflight.append((specs, handles))
        while len(inflight) > LOOKAHEAD:
            _finish_one()
    while inflight:
        _finish_one()

    frame_bytes_in_order = [frame_bytes_by_order[o]
                            for o in sorted(frame_bytes_by_order)]
    header = bs.GopHeader(gop_struct_name=gop.name, idx_rate=idx_rate)
    return bs.pack_gop(header, frame_bytes_in_order), {
        first_idx + k: v for k, v in decoded.items()}


class GopStreamStore:
    """Crash-salvageable per-GOP encode state (SURVEY.md §5: the
    reference leaves per-frame files behind only by accident,
    src/real_life/bitstream.py:298-304; here resumability is designed).

    Each finished GOP is written atomically to <dir>/gop_NNNNN.bin with
    its per-frame stats beside it; a manifest pins every setting the
    bytes depend on, so a resume with mismatched settings refuses instead
    of silently mixing incompatible chunks."""

    def __init__(self, directory: str, meta: Dict):
        import json
        from pathlib import Path

        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._json = json
        mf = self.dir / "manifest.json"
        if mf.exists():
            old = json.loads(mf.read_text())
            if old != meta:
                diff = {k: (old.get(k), meta.get(k))
                        for k in set(old) | set(meta)
                        if old.get(k) != meta.get(k)}
                raise ValueError(
                    f"stream_dir {directory} belongs to a different encode "
                    f"(mismatched: {diff}); use a fresh directory")
        else:
            tmp = mf.with_suffix(".tmp")
            tmp.write_text(json.dumps(meta, indent=2))
            tmp.rename(mf)

    def _chunk(self, g: int):
        return self.dir / f"gop_{g:05d}.bin"

    def has(self, g: int) -> bool:
        return self._chunk(g).exists()

    def load(self, g: int) -> bytes:
        return self._chunk(g).read_bytes()

    def save(self, g: int, data: bytes, frame_results: List[FrameResult]):
        import dataclasses

        tmp = self._chunk(g).with_suffix(".tmp")
        tmp.write_bytes(data)
        tmp.rename(self._chunk(g))
        rows = [dataclasses.asdict(r) for r in frame_results]
        rf = self.dir / f"gop_{g:05d}.json"
        tmp = rf.with_suffix(".tmp")
        tmp.write_text(self._json.dumps(rows))
        tmp.rename(rf)

    def load_results(self, g: int) -> List[FrameResult]:
        rows = self._json.loads((self.dir / f"gop_{g:05d}.json").read_text())
        return [FrameResult(**r) for r in rows]


def _decode_gop_chunk(codec: FrameCodec, gop_bytes: bytes, wave_batch: int,
                      backend: str) -> Dict[int, DecodedFrame]:
    """Decode one packed GOP chunk (indices local to the GOP)."""
    gop_header, frame_chunks = bs.unpack_gop(gop_bytes)
    gop = generate_gop_struct(gop_header.gop_struct_name)
    by_order = {spec.coding_order: fb
                for spec, fb in zip(gop.coding_order, frame_chunks)}
    decoded: Dict[int, DecodedFrame] = {}
    for ftype, specs in wave_groups(gop, max(1, wave_batch)):
        decs = codec.decode_frames_batch(
            [by_order[s.coding_order] for s in specs],
            [_ref(decoded, s.prev_ref) for s in specs],
            [_ref(decoded, s.next_ref) for s in specs],
            ftype, gop_header.idx_rate, backend=backend)
        for spec, dec in zip(specs, decs):
            decoded[spec.idx] = dec
    return decoded


def encode_video(codec: FrameCodec, frames: Sequence[Dict[str, np.ndarray]],
                 coding: CodingConfig, verbose: bool = False,
                 wave_batch: int = 1,
                 stream_dir: Optional[str] = None) -> EncodeResult:
    """Encode a full sequence of uint8 YUV420 frames into one bitstream.

    wave_batch is recorded in the video header, so the decoder derives it
    from the bitstream alone (it is part of the determinism contract, see
    wave_groups)."""
    name = coding.gop_struct_name()
    gop = generate_gop_struct(name)
    gop_len = len(gop)

    n_frames = len(frames)
    if n_frames > 65536:
        raise ValueError(
            f"{n_frames} frames exceed the 2-byte frame-index header range "
            "(reference cap: 2^16 - 1, src/aivc.py:84-101); encode in "
            "segments")
    nb_gop = -(-n_frames // gop_len)
    idx_first = 0
    idx_last = n_frames - 1

    t0 = time.time()
    results: List[FrameResult] = []
    gop_chunks: List[bytes] = []
    all_decoded: Dict[int, DecodedFrame] = {}

    store = None
    if stream_dir is not None:
        store = GopStreamStore(stream_dir, {
            "n_frames": n_frames, "gop": name, "h": codec.h, "w": codec.w,
            "idx_rate": coding.idx_rate, "wave_batch": wave_batch,
            "backend": codec.backend, "model": codec.cfg.name,
            "elide": getattr(codec, "elide", False),
        })

    if gop_len == 1 and wave_batch > 1:
        # All-Intra fast path: frames are fully independent
        # (SURVEY.md §2.5 "AI mode is embarrassingly parallel per frame"),
        # so consecutive frames batch across GOP boundaries.  Chunking is
        # derived from (n_frames, wave_batch) alone so the decoder groups
        # identically.
        n_pix = codec.h * codec.w
        header0 = bs.GopHeader(gop_struct_name=name, idx_rate=coding.idx_rate)
        for start in range(0, n_frames, wave_batch):
            group = list(range(start, min(start + wave_batch, n_frames)))
            if store is not None and all(store.has(i) for i in group):
                # Resume: reload the whole batch and re-decode it at the
                # SAME grouping the encoder used (the batch is part of
                # the determinism contract, see wave_groups).
                chunks = [store.load(i) for i in group]
                gop_chunks.extend(chunks)
                for i in group:
                    results.extend(store.load_results(i))
                decs = codec.decode_frames_batch(
                    [bs.unpack_gop(c)[1][0] for c in chunks],
                    [None] * len(group), [None] * len(group), 0,
                    coding.idx_rate, backend=codec.backend)
                for i, dec in zip(group, decs):
                    all_decoded[i] = dec
                continue
            fbs, decs, stats = codec.encode_frames_batch(
                [frames[i] for i in group], [None] * len(group),
                [None] * len(group), 0, coding.idx_rate)
            for i, fb, dec, st in zip(group, fbs, decs, stats):
                chunk = bs.pack_gop(header0, [fb])
                gop_chunks.append(chunk)
                all_decoded[i] = dec
                fr = FrameResult(
                    idx=i, frame_type=0, bytes=st["bytes"],
                    mode_bytes=st["mode_bytes"],
                    codec_bytes=st["codec_bytes"],
                    alpha_mean=st["alpha_mean"], beta_mean=st["beta_mean"],
                    bpp=st["bytes"] * 8.0 / n_pix,
                    analytic_bits=st.get("analytic_bits", 0.0))
                results.append(fr)
                if store is not None:
                    store.save(i, chunk, [fr])
        header = codec.video_header(nb_gop, idx_first, idx_last,
                                    wave_batch=wave_batch)
        video = bs.pack_video(header, gop_chunks)
        elapsed = max(time.time() - t0, 1e-9)
        return EncodeResult(
            bitstream=video, frame_results=results,
            decoded_frames=all_decoded, fps=n_frames / elapsed)

    for g in range(nb_gop):
        start = g * gop_len
        if store is not None and store.has(g):
            # Resume: the chunk is already on disk; reload its bytes and
            # stats, and rebuild the decoded frames through the normal
            # decode path (bit-exact with what the encoder produced).
            gop_bytes = store.load(g)
            gop_results = store.load_results(g)
            results.extend(gop_results)
            decoded = {start + k: v for k, v in _decode_gop_chunk(
                codec, gop_bytes, wave_batch, codec.backend).items()}
        else:
            gop_frames = []
            for i in range(gop_len):
                # Pad the tail by repeating the last frame
                # (reference: img_processing.py:155-174)
                gop_frames.append(frames[min(start + i, n_frames - 1)])
            n_before = len(results)
            gop_bytes, decoded = encode_gop(
                codec, gop, gop_frames, coding.idx_rate, start, results,
                wave_batch=wave_batch)
            if store is not None:
                store.save(g, gop_bytes, results[n_before:])
        gop_chunks.append(gop_bytes)
        all_decoded.update({k: v for k, v in decoded.items() if k <= idx_last})

    header = codec.video_header(nb_gop, idx_first, idx_last,
                                wave_batch=wave_batch)
    video = bs.pack_video(header, gop_chunks)
    elapsed = max(time.time() - t0, 1e-9)
    return EncodeResult(
        bitstream=video, frame_results=results, decoded_frames=all_decoded,
        fps=n_frames / elapsed)


def decode_video(codec: FrameCodec, data: bytes,
                 wave_batch: Optional[int] = None) -> Dict[int, DecodedFrame]:
    """Decode a muxed bitstream. Only the bitstream and the model are used
    (the closed-loop property, reference: decode.py:44-155): wave_batch is
    read from the video header.  Passing wave_batch explicitly is only a
    cross-check — a mismatch with the header raises, because decoding with
    a different grouping would silently drift (see wave_groups)."""
    header, gop_chunks = bs.unpack_video(data)
    if (1 << header.ac_log2) != codec.ac_max:
        raise ValueError(
            f"bitstream was encoded with alphabet +-{1 << header.ac_log2} "
            f"but this model declares ac_max_val={codec.ac_max}; decoding "
            "with mismatched CDF tables would produce garbage latents")
    codec.check_sched(header)
    if wave_batch is None:
        wave_batch = header.wave_batch
    elif wave_batch != header.wave_batch:
        raise ValueError(
            f"wave_batch {wave_batch} does not match the bitstream header's "
            f"{header.wave_batch}; decoding with a different wave grouping "
            "is not bit-exact (omit the argument to use the header)")
    decoded_all: Dict[int, DecodedFrame] = {}
    first_idx = header.idx_first_frame
    # The chunk format is recorded in the video header, so any codec
    # decodes any bitstream regardless of its own encoding backend.
    backend = ("device" if header.backend == bs.BACKEND_DEVICE else "host")

    # All-Intra fast path mirror: regroup single-frame GOPs into the same
    # batches the encoder used (wave_batch must match).
    if wave_batch > 1 and gop_chunks:
        probe_header, probe_frames = bs.unpack_gop(gop_chunks[0])
        if (probe_header.gop_struct_name == "1_GOP_0"
                and len(probe_frames) == 1):
            n = len(gop_chunks)
            frame_bytes = [bs.unpack_gop(g)[1][0] for g in gop_chunks]
            for start in range(0, n, wave_batch):
                group = list(range(start, min(start + wave_batch, n)))
                decs = codec.decode_frames_batch(
                    [frame_bytes[i] for i in group], [None] * len(group),
                    [None] * len(group), 0, probe_header.idx_rate,
                    backend=backend)
                for i, dec in zip(group, decs):
                    decoded_all[first_idx + i] = dec
            return {k: v for k, v in decoded_all.items()
                    if k <= header.idx_last_frame}

    for gop_bytes in gop_chunks:
        decoded = _decode_gop_chunk(codec, gop_bytes, wave_batch, backend)
        decoded_all.update({first_idx + k: v for k, v in decoded.items()})
        first_idx += len(decoded)

    # Remove padded frames beyond the signalled last index
    # (reference: decode.py:157-190)
    return {k: v for k, v in decoded_all.items()
            if k <= header.idx_last_frame}


_MSSSIM_BATCH = None  # cached jit: one compile per plane geometry


def evaluate_frames(orig: Sequence[Dict[str, np.ndarray]],
                    decoded: Dict[int, DecodedFrame]) -> Dict[str, float]:
    """PSNR / MS-SSIM between original and decoded uint8 YUV420 frames,
    pixel-count weighted over planes (reference: src/evaluate.py:62-78,
    src/clic21/metrics.py:30-55).

    MS-SSIM runs as ONE vmapped jit call per plane type (y, u, v) over
    all frames, and the jitted function is cached at module scope —
    per-frame per-plane dispatch used to re-trace on every
    evaluate_frames call, which a 7-rate multi-resolution sweep paid
    dearly for (VERDICT r2).  vmap keeps per-frame semantics: msssim
    averages each scale before the cross-scale product, so batching
    inside one call would compute prod-of-means instead of the
    per-frame mean-of-prods the reference reports."""
    import jax
    import jax.numpy as jnp

    from aivc_tpu.ops.metrics import msssim

    global _MSSSIM_BATCH
    if _MSSSIM_BATCH is None:
        _MSSSIM_BATCH = jax.jit(jax.vmap(
            lambda a, b: msssim(a[None], b[None])))

    n_frames = len(orig)
    tot_se = 0.0
    tot_n = 0
    ms_num = 0.0
    ms_den = 0
    for k in ("y", "u", "v"):
        a = np.stack([f[k] for f in orig]).astype(np.float64) / 255.0
        b = np.stack([decoded[i][k] for i in range(n_frames)]
                     ).astype(np.float64) / 255.0
        tot_se += ((a - b) ** 2).sum()
        tot_n += a.size
        ms_k = np.asarray(_MSSSIM_BATCH(
            jnp.asarray(a, jnp.float32)[..., None],
            jnp.asarray(b, jnp.float32)[..., None]))       # [N] per frame
        plane_px = a[0].size
        ms_num += ms_k.mean() * plane_px
        ms_den += plane_px
    mse = tot_se / tot_n
    ms_mean = ms_num / ms_den
    return {
        "psnr": 10.0 * np.log10(1.0 / max(mse, 1e-12)),
        "ms_ssim": ms_mean,
        "ms_ssim_db": -10.0 * np.log10(max(1.0 - ms_mean, 1e-12)),
    }
