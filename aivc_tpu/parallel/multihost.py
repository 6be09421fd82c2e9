"""Multi-host GOP sharding: distribute a sequence's GOPs across a
jax.distributed cluster and mux the bitstream on process 0.

The reference has no distributed layer at all (SURVEY.md §2.5); this
module supplies the GOP-level data parallelism the build targets: in
every coding structure each GOP chunk is self-contained after the video
header (it starts with its own I-frame and decodes against its own
reconstructions, reference: src/real_life/decode.py:193-326), so GOPs
are embarrassingly parallel across hosts.  Each process encodes the
GOPs with ``index % process_count == process_index``; the per-GOP byte
chunks are exchanged with an all-gather over the DCN (the analogue of
gathering to host 0 for ``cat_one_video``, reference:
src/real_life/cat_binary_files.py:104-127) and process 0 assembles the
final bitstream.

Determinism: every process must construct the same FrameCodec (same
checkpoint, resolution, wave_batch); the coded bytes are then identical
to a single-host encode, byte for byte — asserted by
tests/test_multihost.py.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from aivc_tpu.coding import bitstream as bs
from aivc_tpu.config import CodingConfig
from aivc_tpu.gop import generate_gop_struct
from aivc_tpu.pipeline.codec import FrameCodec
from aivc_tpu.pipeline.video import FrameResult, encode_gop


def _allgather_bytes(chunks: List[bytes]) -> List[List[bytes]]:
    """All-gather a list of byte strings from every process.

    Returns, on every process, ``out[p]`` = the list contributed by
    process p.  Implemented over jax.experimental.multihost_utils with
    length-prefixed uint8 payloads padded to the global maximum.
    """
    import jax
    from jax.experimental import multihost_utils

    payload = bytearray()
    payload.extend(len(chunks).to_bytes(4, "big"))
    for c in chunks:
        payload.extend(len(c).to_bytes(4, "big"))
        payload.extend(c)
    local = np.frombuffer(bytes(payload), dtype=np.uint8)

    n = np.asarray([local.size], np.int32)
    sizes = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    max_len = int(sizes.max())
    padded = np.zeros(max_len, np.uint8)
    padded[: local.size] = local
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(jax.process_count(), max_len)

    out: List[List[bytes]] = []
    for p in range(jax.process_count()):
        buf = gathered[p, : int(sizes[p])].tobytes()
        cnt = int.from_bytes(buf[:4], "big")
        pos = 4
        lst = []
        for _ in range(cnt):
            ln = int.from_bytes(buf[pos:pos + 4], "big")
            pos += 4
            lst.append(buf[pos:pos + ln])
            pos += ln
        out.append(lst)
    return out


def encode_video_multihost(codec: FrameCodec,
                           frames: Sequence[Dict[str, np.ndarray]],
                           coding: CodingConfig,
                           wave_batch: int = 1) -> Optional[bytes]:
    """Encode a sequence with GOPs sharded over jax.distributed processes.

    Every process sees the full ``frames`` (or at least the frames of its
    own GOPs — extra entries are never touched) and encodes GOP indices
    congruent to its process index.  Returns the muxed bitstream on
    process 0 and on every other process too (the gather is an
    all-gather, so any host can serve the result).
    """
    import jax

    n_proc = jax.process_count()
    proc = jax.process_index()

    name = coding.gop_struct_name()
    gop = generate_gop_struct(name)
    gop_len = len(gop)
    n_frames = len(frames)
    nb_gop = -(-n_frames // gop_len)

    my_chunks: List[bytes] = []
    results: List[FrameResult] = []
    for g in range(proc, nb_gop, n_proc):
        start = g * gop_len
        gop_frames = [frames[min(start + i, n_frames - 1)]
                      for i in range(gop_len)]
        gop_bytes, _ = encode_gop(codec, gop, gop_frames, coding.idx_rate,
                                  start, results, wave_batch=wave_batch)
        my_chunks.append(gop_bytes)

    per_proc = _allgather_bytes(my_chunks)
    ordered: List[bytes] = [b""] * nb_gop
    for p in range(n_proc):
        for j, chunk in enumerate(per_proc[p]):
            ordered[p + j * n_proc] = chunk
    if any(len(c) == 0 for c in ordered):
        raise RuntimeError("missing GOP chunk after all-gather")

    header = codec.video_header(nb_gop, 0, n_frames - 1,
                                wave_batch=wave_batch)
    return bs.pack_video(header, ordered)
