"""Measure a reference-shaped torch pipeline in-env (baseline grounding).

The reference publishes no FPS numbers and its model pickles are absent
(LFS), so round 1's vs_baseline denominator was an estimate (VERDICT r1
weak #3).  This script grounds it: it assembles the flagship
architecture out of the REFERENCE'S OWN layer classes
(/root/reference/src/layers — CustomConvLayer, UpscalingLayer,
SimplifiedAttention, GDN, warp) and times the per-frame encode+decode
compute DAG in torch on this host's CPU, with entropy coding omitted
(a strict advantage to the reference).  Comparing against our codec on
the SAME CPU gives an equal-hardware framework-vs-framework ratio;
BASELINE.md records both.

Usage: python scripts/ref_baseline.py [--h 1080 --w 1920] [--frames 3]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import types
from pathlib import Path

REF = "/root/reference/src"
sys.path.insert(0, REF)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# torchvision stub (reference imports it for PNG helpers we never touch)
if "torchvision" not in sys.modules:
    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")
    functional.to_tensor = None
    functional.to_pil_image = None
    transforms.functional = functional
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional

import torch  # noqa: E402
from torch import nn  # noqa: E402

from layers.misc.custom_conv_layers import (  # noqa: E402
    CustomConvLayer,
    UpscalingLayer,
)
from layers.misc.attention import SimplifiedAttention  # noqa: E402
from func_util.optical_flow import warp  # noqa: E402


def analysis(in_c, nb_ft, out_ft, attn=True):
    mods = [
        CustomConvLayer(5, in_c, nb_ft, non_linearity="gdn", conv_stride=2),
        CustomConvLayer(5, nb_ft, nb_ft, non_linearity="gdn", conv_stride=2),
    ]
    if attn:
        mods.append(SimplifiedAttention(nb_ft))
    mods += [
        CustomConvLayer(5, nb_ft, nb_ft, non_linearity="gdn", conv_stride=2),
        CustomConvLayer(5, nb_ft, out_ft, non_linearity="no", conv_stride=2),
    ]
    return nn.Sequential(*mods)


def synthesis(in_c, nb_ft, out_ft, attn=True):
    mods = [UpscalingLayer(5, in_c, nb_ft, non_linearity="gdn_inverse")]
    if attn:
        mods.append(SimplifiedAttention(nb_ft))
    mods += [
        UpscalingLayer(5, nb_ft, nb_ft, non_linearity="gdn_inverse"),
        UpscalingLayer(5, nb_ft, nb_ft, non_linearity="gdn_inverse"),
        UpscalingLayer(5, nb_ft, out_ft, non_linearity="no"),
    ]
    return nn.Sequential(*mods)


def hyper_analysis(in_c, nb_ft):
    return nn.Sequential(
        CustomConvLayer(3, in_c, nb_ft, non_linearity="leaky_relu"),
        CustomConvLayer(5, nb_ft, nb_ft, non_linearity="leaky_relu",
                        conv_stride=2),
        CustomConvLayer(5, nb_ft, nb_ft, non_linearity="no", conv_stride=2),
    )


def hyper_synthesis(in_c, nb_ft, out_c):
    return nn.Sequential(
        UpscalingLayer(5, in_c, nb_ft, non_linearity="leaky_relu"),
        UpscalingLayer(5, nb_ft, nb_ft, non_linearity="leaky_relu"),
        CustomConvLayer(3, nb_ft, out_c, non_linearity="no"),
    )


class RefShapedCodec(nn.Module):
    """Flagship-architecture frame codec built from reference layers.

    Channel counts match models/zoo.py BASE (mofnet 96/48, codecnet
    128/64) so the comparison is equal-capacity."""

    def __init__(self):
        super().__init__()
        # MOFNet
        self.m_ga = analysis(9, 96, 96)
        self.m_garef = analysis(6, 96, 48, attn=False)
        self.m_ha = hyper_analysis(96, 48)
        self.m_hs = hyper_synthesis(48, 96, 2 * 96)
        self.m_gs = synthesis(96 + 48, 96, 6)
        # CodecNet
        self.c_ga = analysis(6, 128, 128)
        self.c_garef = analysis(3, 128, 64, attn=False)
        self.c_ha = hyper_analysis(128, 64)
        self.c_hs = hyper_synthesis(64, 128, 2 * 128)
        self.c_gs = synthesis(128 + 64, 128, 3)

    def forward_frame(self, x, prev, nxt):
        """Encoder-side P/B frame: full latent production + closed-loop
        reconstruction (mirrors SURVEY.md §2.3's dataflow); entropy
        coding omitted."""
        # MOFNet
        y_m = self.m_ga(torch.cat([x, prev, nxt], dim=1))
        z_m = self.m_ha(y_m)
        musig = self.m_hs(torch.round(z_m))
        y_mq = torch.round(y_m - musig[:, :96])
        sc_m = self.m_garef(torch.cat([prev, nxt], dim=1))
        maps = self.m_gs(torch.cat([y_mq + musig[:, :96], sc_m], dim=1))
        alpha = torch.clamp(maps[:, 0:1] + 0.5, 0, 1)
        beta = torch.clamp(maps[:, 1:2] + 0.5, 0, 1)
        x_warp = (beta * warp(prev, maps[:, 2:4])
                  + (1 - beta) * warp(nxt, maps[:, 4:6]))
        pred = alpha * x_warp
        # CodecNet
        y_c = self.c_ga(torch.cat([x, pred], dim=1))
        z_c = self.c_ha(y_c)
        musig_c = self.c_hs(torch.round(z_c))
        y_cq = torch.round(y_c - musig_c[:, :128])
        sc_c = self.c_garef(pred)
        out = self.c_gs(torch.cat([y_cq + musig_c[:, :128], sc_c], dim=1))
        return out + (1 - alpha) * x_warp

    def decode_frame(self, z_m, z_c, prev, nxt):
        """Decoder-side P/B frame from (already entropy-decoded) z's and
        dummy y's (their size is implied by the hyper output)."""
        musig = self.m_hs(z_m)
        y_mq = torch.zeros_like(musig[:, :96])
        sc_m = self.m_garef(torch.cat([prev, nxt], dim=1))
        maps = self.m_gs(torch.cat([y_mq + musig[:, :96], sc_m], dim=1))
        alpha = torch.clamp(maps[:, 0:1] + 0.5, 0, 1)
        beta = torch.clamp(maps[:, 1:2] + 0.5, 0, 1)
        x_warp = (beta * warp(prev, maps[:, 2:4])
                  + (1 - beta) * warp(nxt, maps[:, 4:6]))
        pred = alpha * x_warp
        musig_c = self.c_hs(z_c)
        y_cq = torch.zeros_like(musig_c[:, :128])
        sc_c = self.c_garef(pred)
        out = self.c_gs(torch.cat([y_cq + musig_c[:, :128], sc_c], dim=1))
        return out + (1 - alpha) * x_warp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--threads", type=int, default=0)
    args = ap.parse_args()

    if args.threads:
        torch.set_num_threads(args.threads)

    hp = -(-args.h // 64) * 64
    wp = -(-args.w // 64) * 64
    model = RefShapedCodec().eval()
    x = torch.rand(1, 3, hp, wp)
    prev = torch.rand(1, 3, hp, wp)
    nxt = torch.rand(1, 3, hp, wp)
    z_m = torch.zeros(1, 48, hp // 64, wp // 64)
    z_c = torch.zeros(1, 64, hp // 64, wp // 64)

    with torch.no_grad():
        model.forward_frame(x, prev, nxt)  # warm-up
        t0 = time.time()
        for _ in range(args.frames):
            model.forward_frame(x, prev, nxt)
        t_enc = (time.time() - t0) / args.frames
        model.decode_frame(z_m, z_c, prev, nxt)  # warm-up
        t0 = time.time()
        for _ in range(args.frames):
            model.decode_frame(z_m, z_c, prev, nxt)
        t_dec = (time.time() - t0) / args.frames

    print(json.dumps({
        "metric": f"reference-shaped torch CPU, {args.w}x{args.h}",
        "enc_s_per_frame": round(t_enc, 3),
        "dec_s_per_frame": round(t_dec, 3),
        "encdec_fps": round(1.0 / (t_enc + t_dec), 4),
        "torch_threads": torch.get_num_threads(),
        "note": "entropy coding omitted (advantage: reference)",
    }))


if __name__ == "__main__":
    main()
