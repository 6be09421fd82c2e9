"""Sanity run: the reference sanity_script.sh equivalent.

Encodes/decodes/evaluates a deterministic synthetic clip end-to-end with
the tiny model and checks the invariants that must always hold
(reference pins exact metric values for its pretrained model,
reference: src/sanity_script.sh:5-14, README.md:155-171; ours asserts
structure + bit-exactness, since zoo weights are random until trained):

  * bitstream is produced and non-trivial
  * decode consumes only the bitstream and matches the encoder's
    closed-loop output bit-exactly (md5 manifest)
  * per-chunk entropy coding is lossless (debug self-check)
  * metrics are finite

Usage: python scripts/sanity.py [--cpu]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np


def main():
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from aivc_tpu.config import CodingConfig
    from aivc_tpu.models.zoo import TINY, init_fullnet
    from aivc_tpu.pipeline.codec import FrameCodec
    from aivc_tpu.pipeline.video import decode_video, encode_video, evaluate_frames
    from aivc_tpu.utils.debug import check_md5_manifest, write_md5_manifest
    from bench import synthetic_frames

    h, w, n = 240, 416, 9
    frames = synthetic_frames(n, h, w, seed=1234)
    _, params = init_fullnet(TINY, jax.random.PRNGKey(0))
    codec = FrameCodec(TINY, params, h, w, debug=True)

    coding = CodingConfig(coding_config="RA", gop_size=8, intra_period=8)
    res = encode_video(codec, frames, coding)
    assert res.total_bytes > 100, "suspiciously small bitstream"

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        manifest = Path(td) / "m.json"
        write_md5_manifest(res.decoded_frames, manifest)
        decoded = decode_video(codec, res.bitstream)
        assert check_md5_manifest(decoded, manifest, verbose=False), \
            "encoder/decoder drift!"

    m = evaluate_frames(frames, decoded)
    assert np.isfinite(m["psnr"])
    print(f"[SANITY] frames                : {n}")
    print(f"[SANITY] bitstream bytes       : {res.total_bytes}")
    print(f"[SANITY] rate bpp              : "
          f"{res.total_bytes * 8 / (h * w * n):.4f}")
    print(f"[SANITY] psnr                  : {m['psnr']:.5f} dB")
    print(f"[SANITY] ms-ssim               : {m['ms_ssim']:.5f}")
    print(f"[SANITY] enc/dec               : bit-exact")
    print("[SANITY] OK")


if __name__ == "__main__":
    main()
