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
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from aivc_tpu.coding import bitstream as bs
from aivc_tpu.config import FRAME_B, FRAME_I, FRAME_P, CodingConfig
from aivc_tpu.gop import GopStruct, generate_gop_struct
from aivc_tpu.pipeline.codec import FrameCodec


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


@dataclass
class EncodeResult:
    bitstream: bytes
    frame_results: List[FrameResult]
    decoded_frames: Dict[int, Dict[str, np.ndarray]]
    fps: float

    @property
    def total_bytes(self) -> int:
        return len(self.bitstream)


def _ref_planes(decoded: Dict[int, Dict[str, np.ndarray]],
                idx: Optional[int]):
    return None if idx is None else decoded[idx]


def encode_gop(codec: FrameCodec, gop: GopStruct,
               frames_u8: Sequence[Dict[str, np.ndarray]],
               idx_rate: float, first_idx: int,
               results: List[FrameResult]) -> (bytes, Dict[int, Dict]):
    """Encode one GOP (frames given in display order for this GOP).

    Returns (packed GOP bytes, decoded frames by absolute index).
    """
    decoded: Dict[int, Dict[str, np.ndarray]] = {}
    frame_bytes_in_order: List[bytes] = []
    n_pix = codec.h * codec.w

    for spec in gop.coding_order:
        frame_u8 = frames_u8[spec.idx]
        prev = _ref_planes(decoded, spec.prev_ref)
        nxt = _ref_planes(decoded, spec.next_ref)
        fb, dec, st = codec.encode_frame(
            frame_u8, prev, nxt, spec.frame_type, idx_rate)
        decoded[spec.idx] = dec
        frame_bytes_in_order.append(fb)
        results.append(FrameResult(
            idx=first_idx + spec.idx, frame_type=spec.frame_type,
            bytes=st["bytes"], mode_bytes=st["mode_bytes"],
            codec_bytes=st["codec_bytes"], alpha_mean=st["alpha_mean"],
            beta_mean=st["beta_mean"], bpp=st["bytes"] * 8.0 / n_pix))

    header = bs.GopHeader(gop_struct_name=gop.name, idx_rate=idx_rate)
    return bs.pack_gop(header, frame_bytes_in_order), {
        first_idx + k: v for k, v in decoded.items()}


def encode_video(codec: FrameCodec, frames: Sequence[Dict[str, np.ndarray]],
                 coding: CodingConfig, verbose: bool = False) -> EncodeResult:
    """Encode a full sequence of uint8 YUV420 frames into one bitstream."""
    name = coding.gop_struct_name()
    gop = generate_gop_struct(name)
    gop_len = len(gop)

    n_frames = len(frames)
    nb_gop = -(-n_frames // gop_len)
    idx_first = 0
    idx_last = n_frames - 1

    t0 = time.time()
    results: List[FrameResult] = []
    gop_chunks: List[bytes] = []
    all_decoded: Dict[int, Dict[str, np.ndarray]] = {}

    for g in range(nb_gop):
        start = g * gop_len
        gop_frames = []
        for i in range(gop_len):
            # Pad the tail by repeating the last frame
            # (reference: img_processing.py:155-174)
            gop_frames.append(frames[min(start + i, n_frames - 1)])
        gop_bytes, decoded = encode_gop(
            codec, gop, gop_frames, coding.idx_rate, start, results)
        gop_chunks.append(gop_bytes)
        all_decoded.update({k: v for k, v in decoded.items() if k <= idx_last})

    header = codec.video_header(nb_gop, idx_first, idx_last)
    video = bs.pack_video(header, gop_chunks)
    elapsed = max(time.time() - t0, 1e-9)
    return EncodeResult(
        bitstream=video, frame_results=results, decoded_frames=all_decoded,
        fps=n_frames / elapsed)


def decode_video(codec: FrameCodec, data: bytes
                 ) -> Dict[int, Dict[str, np.ndarray]]:
    """Decode a muxed bitstream. Only the bitstream and the model are used
    (the closed-loop property, reference: decode.py:44-155)."""
    header, gop_chunks = bs.unpack_video(data)
    decoded_all: Dict[int, Dict[str, np.ndarray]] = {}
    first_idx = header.idx_first_frame

    for gop_bytes in gop_chunks:
        gop_header, frame_chunks = bs.unpack_gop(gop_bytes)
        gop = generate_gop_struct(gop_header.gop_struct_name)
        decoded: Dict[int, Dict[str, np.ndarray]] = {}
        for spec, fb in zip(gop.coding_order, frame_chunks):
            prev = _ref_planes(decoded, spec.prev_ref)
            nxt = _ref_planes(decoded, spec.next_ref)
            decoded[spec.idx] = codec.decode_frame(
                fb, prev, nxt, spec.frame_type, gop_header.idx_rate)
        decoded_all.update({first_idx + k: v for k, v in decoded.items()})
        first_idx += len(gop)

    # Remove padded frames beyond the signalled last index
    # (reference: decode.py:157-190)
    return {k: v for k, v in decoded_all.items()
            if k <= header.idx_last_frame}


def evaluate_frames(orig: Sequence[Dict[str, np.ndarray]],
                    decoded: Dict[int, Dict[str, np.ndarray]]) -> Dict[str, float]:
    """PSNR / MS-SSIM between original and decoded uint8 YUV420 frames,
    pixel-count weighted over planes (reference: src/evaluate.py:62-78,
    src/clic21/metrics.py:30-55)."""
    import jax
    import jax.numpy as jnp

    from aivc_tpu.ops.metrics import msssim, psnr

    jit_ms = jax.jit(msssim)

    tot_se = 0.0
    tot_n = 0
    ms_acc = 0.0
    for i, frame in enumerate(orig):
        dec = decoded[i]
        frame_ms = 0.0
        frame_n = 0
        for k in ("y", "u", "v"):
            a = frame[k].astype(np.float64) / 255.0
            b = dec[k].astype(np.float64) / 255.0
            tot_se += ((a - b) ** 2).sum()
            tot_n += a.size
            ms = float(jit_ms(
                jnp.asarray(a, jnp.float32)[None, :, :, None],
                jnp.asarray(b, jnp.float32)[None, :, :, None]))
            frame_ms += ms * a.size
            frame_n += a.size
        ms_acc += frame_ms / frame_n
    mse = tot_se / tot_n
    ms_mean = ms_acc / len(orig)
    return {
        "psnr": 10.0 * np.log10(1.0 / max(mse, 1e-12)),
        "ms_ssim": ms_mean,
        "ms_ssim_db": -10.0 * np.log10(max(1.0 - ms_mean, 1e-12)),
    }
