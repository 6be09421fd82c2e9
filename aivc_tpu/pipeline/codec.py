"""FrameCodec: the real-bitstream frame coding engine.

Splits per-frame coding into jit-compiled device stages with the host
range coder in between:

  encode:  to444 -> [P/B] mof_analyze -> mof_hyper -> y_quant
           -> rANS(z_m), rANS(y_m) -> mof_synth -> cod_analyze
           -> cod_hyper -> y_quant -> rANS(z_c), rANS(y_c)
           -> cod_synth -> cast to YUV420 (the closed decoding loop)
  decode:  to444(refs) -> rANS^-1(z_m) -> mof_hyper -> rANS^-1(y_m)
           -> mof_synth -> rANS^-1(z_c) -> cod_hyper -> rANS^-1(y_c)
           -> cod_synth -> cast

Encoder and decoder share the *same* compiled programs for every stage
whose floats feed entropy coding or reconstruction, which makes
encode/decode bit-exact on one platform by construction — replacing the
reference's global determinism flags (reference:
src/func_util/cluster_mngt.py:27-37, src/real_life/decode.py:844-867).

frame_type is a static argument: three XLA specializations, no runtime
branching (SURVEY.md §7 "Variable GOP DAG under jit").
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aivc_tpu.coding import bitstream as bs
from aivc_tpu.coding.cdf import (
    build_laplace_table,
    build_z_table,
    sigma_to_bin_jnp,
)
from aivc_tpu.config import (
    AC_MAX_VAL,
    FRAME_B,
    FRAME_I,
    FRAME_P,
    PAD_MULTIPLE,
    Y_DOWNSCALE,
    Z_DOWNSCALE,
    ModelConfig,
)
from aivc_tpu.models.fullnet import FullNet
from aivc_tpu.ops.layers import x444_to_yuv420, yuv420_to_444


def pad_to_multiple(x: np.ndarray, mult: int) -> np.ndarray:
    """Edge-pad H, W (axes 1, 2) of an NHWC array up to a multiple."""
    H, W = x.shape[1], x.shape[2]
    ph = (-H) % mult
    pw = (-W) % mult
    if ph or pw:
        x = np.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return x


class FrameCodec:
    """Per-resolution compiled codec around a FullNet parameter tree."""

    def __init__(self, cfg: ModelConfig, params, height: int, width: int):
        self.cfg = cfg
        self.params = params
        self.h, self.w = height, width
        self.hp = math.ceil(height / PAD_MULTIPLE) * PAD_MULTIPLE
        self.wp = math.ceil(width / PAD_MULTIPLE) * PAD_MULTIPLE
        self.h_uv, self.w_uv = math.ceil(height / 2), math.ceil(width / 2)
        self.hy, self.wy = self.hp // Y_DOWNSCALE, self.wp // Y_DOWNSCALE
        self.hz, self.wz = self.hp // Z_DOWNSCALE, self.wp // Z_DOWNSCALE

        self.model = FullNet(cfg)

        # Integer CDF tables, built once per model load (the analogue of
        # reference _precompute_z_cdf, bitstream.py:82-125).
        from aivc_tpu.ops.entropy_models import FactorizedPrior

        self.laplace_rows = build_laplace_table()
        self.z_rows = {}
        for which in ("mofnet", "codecnet"):
            net_cfg = cfg.mofnet if which == "mofnet" else cfg.codecnet
            prior = FactorizedPrior(net_cfg.nb_ft_z)
            prior_params = {"params": params["params"][
                "mofnet" if which == "mofnet" else "codecnet"]["pdf_z"]}
            self.z_rows[which] = build_z_table(prior, prior_params)

        self._build_stage_fns()

    # ------------------------------------------------------------------
    def _build_stage_fns(self):
        model = self.model

        def apply(method, *args, **kw):
            return model.apply(self.params, *args, method=method, **kw)

        @jax.jit
        def to444(y, u, v):
            return yuv420_to_444(y, u, v)

        @jax.jit
        def cast_yuv(x444):
            """Crop to true size, 444->420, quantize to 256 levels
            (reference cast_before_png_saving, img_processing.py:31-75)."""
            yf, uf, vf = x444_to_yuv420(x444)
            yf = yf[:, : self.h, : self.w, :]
            uf = uf[:, : self.h_uv, : self.w_uv, :]
            vf = vf[:, : self.h_uv, : self.w_uv, :]
            out = {}
            for k, p in (("y", yf), ("u", uf), ("v", vf)):
                out[k] = jnp.clip(jnp.round(jnp.clip(p, 0.0, 1.0) * 255.0),
                                  0, 255).astype(jnp.uint8)
            return out

        @functools.partial(jax.jit, static_argnames=("ftype",))
        def mof_analyze(params, frame, prev, nxt, idx_rate, ftype):
            return model.apply(params, frame, prev, nxt, idx_rate, ftype,
                               method=FullNet.mof_analyze)

        @functools.partial(jax.jit, static_argnames=("ftype",))
        def cod_analyze(params, frame, pred, idx_rate, ftype):
            return model.apply(params, frame, pred, idx_rate, ftype,
                               method=FullNet.cod_analyze)

        @jax.jit
        def mof_hyper(params, z_q):
            mu, sigma = model.apply(params, z_q, method=FullNet.mofnet_hyper)
            return mu, sigma_to_bin_jnp(sigma)

        @jax.jit
        def cod_hyper(params, z_q):
            mu, sigma = model.apply(params, z_q, method=FullNet.codecnet_hyper)
            return mu, sigma_to_bin_jnp(sigma)

        @jax.jit
        def y_quant(y, mu):
            return jnp.clip(jnp.round(y - mu),
                            -AC_MAX_VAL, AC_MAX_VAL - 1).astype(jnp.int32)

        @functools.partial(jax.jit, static_argnames=("ftype",))
        def mof_synth(params, y_cq, mu, prev, nxt, idx_rate, ftype):
            return model.apply(params, y_cq.astype(jnp.float32), mu, prev,
                               nxt, idx_rate, ftype,
                               method=FullNet.mofnet_synth)

        @functools.partial(jax.jit, static_argnames=("ftype",))
        def cod_synth(params, y_cq, mu, pred, skip, idx_rate, ftype):
            return model.apply(params, y_cq.astype(jnp.float32), mu, pred,
                               skip, idx_rate, ftype,
                               method=FullNet.codecnet_synth)

        self._to444 = to444
        self._cast_yuv = cast_yuv
        self._mof_analyze = mof_analyze
        self._cod_analyze = cod_analyze
        self._mof_hyper = mof_hyper
        self._cod_hyper = cod_hyper
        self._y_quant = y_quant
        self._mof_synth = mof_synth
        self._cod_synth = cod_synth

    # ------------------------------------------------------------------
    # Host <-> device frame conversion
    # ------------------------------------------------------------------
    def ref_to_444(self, frame_u8: Optional[Dict[str, np.ndarray]]) -> jax.Array:
        """uint8 YUV420 planes (true size) -> padded float 444 on device.
        None -> the all-zero dummy reference (reference: decode.py:256-270)."""
        if frame_u8 is None:
            y = np.zeros((1, self.hp, self.wp, 1), np.float32)
            u = np.zeros((1, self.hp // 2, self.wp // 2, 1), np.float32)
            return self._to444(jnp.asarray(y), jnp.asarray(u), jnp.asarray(u))
        y = (frame_u8["y"].astype(np.float32) / 255.0)[None, :, :, None]
        u = (frame_u8["u"].astype(np.float32) / 255.0)[None, :, :, None]
        v = (frame_u8["v"].astype(np.float32) / 255.0)[None, :, :, None]
        y = pad_to_multiple(y, PAD_MULTIPLE)
        u = pad_to_multiple(u, PAD_MULTIPLE // 2)
        v = pad_to_multiple(v, PAD_MULTIPLE // 2)
        return self._to444(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v))

    @staticmethod
    def _to_host_u8(planes: Dict[str, jax.Array]) -> Dict[str, np.ndarray]:
        return {k: np.asarray(v)[0, :, :, 0] for k, v in planes.items()}

    # ------------------------------------------------------------------
    # Frame encode / decode
    # ------------------------------------------------------------------
    def encode_frame(self, frame_u8: Dict[str, np.ndarray],
                     prev_u8: Optional[Dict[str, np.ndarray]],
                     next_u8: Optional[Dict[str, np.ndarray]],
                     frame_type: int, idx_rate: float
                     ) -> Tuple[bytes, Dict[str, np.ndarray], Dict]:
        """-> (frame bitstream bytes, decoded YUV420 uint8 planes, stats)."""
        p = self.params
        frame = self.ref_to_444(frame_u8)
        prev = self.ref_to_444(prev_u8)
        nxt = self.ref_to_444(next_u8)
        rate = jnp.float32(idx_rate)

        chunks: Dict[str, bytes] = {}
        stats: Dict = {}

        if frame_type == FRAME_I:
            pred = jnp.zeros_like(frame)
            skip = jnp.zeros_like(frame)
            stats["alpha_mean"] = 1.0
            stats["beta_mean"] = 1.0
        else:
            y_m, z_qm = self._mof_analyze(p, frame, prev, nxt, rate, ftype=frame_type)
            mu_m, bins_m = self._mof_hyper(p, z_qm)
            y_cqm = self._y_quant(y_m, mu_m)

            z_np = np.asarray(z_qm, np.int32)[0]
            chunks["mofnet_z"] = bs.encode_z_chunk(z_np, self.z_rows["mofnet"])
            chunks["mofnet_y"] = bs.encode_y_chunk(
                np.asarray(y_cqm)[0], np.asarray(bins_m)[0], self.laplace_rows)

            mof = self._mof_synth(p, y_cqm, mu_m, prev, nxt, rate,
                                  ftype=frame_type)
            pred, skip = mof["pred"], mof["skip"]
            stats["alpha_mean"] = float(jnp.mean(mof["alpha"]))
            stats["beta_mean"] = float(jnp.mean(mof["beta"]))

        y_c, z_qc = self._cod_analyze(p, frame, pred, rate, ftype=frame_type)
        mu_c, bins_c = self._cod_hyper(p, z_qc)
        y_cqc = self._y_quant(y_c, mu_c)

        chunks["codecnet_z"] = bs.encode_z_chunk(
            np.asarray(z_qc, np.int32)[0], self.z_rows["codecnet"])
        chunks["codecnet_y"] = bs.encode_y_chunk(
            np.asarray(y_cqc)[0], np.asarray(bins_c)[0], self.laplace_rows)

        x_hat = self._cod_synth(p, y_cqc, mu_c, pred, skip, rate,
                                ftype=frame_type)
        decoded = self._to_host_u8(self._cast_yuv(x_hat))

        frame_bytes = bs.pack_frame(chunks)
        stats["bytes"] = len(frame_bytes)
        stats["mode_bytes"] = len(chunks.get("mofnet_z", b"")) + len(
            chunks.get("mofnet_y", b""))
        stats["codec_bytes"] = len(chunks["codecnet_z"]) + len(chunks["codecnet_y"])
        return frame_bytes, decoded, stats

    def decode_frame(self, frame_bytes: bytes,
                     prev_u8: Optional[Dict[str, np.ndarray]],
                     next_u8: Optional[Dict[str, np.ndarray]],
                     frame_type: int, idx_rate: float) -> Dict[str, np.ndarray]:
        """Closed-loop decode: everything comes from the bitstream + refs."""
        p = self.params
        prev = self.ref_to_444(prev_u8)
        nxt = self.ref_to_444(next_u8)
        rate = jnp.float32(idx_rate)
        chunks = bs.unpack_frame(frame_bytes)

        zshape_m = (self.hz, self.wz, self.cfg.mofnet.nb_ft_z)
        zshape_c = (self.hz, self.wz, self.cfg.codecnet.nb_ft_z)
        yshape_m = (self.hy, self.wy, self.cfg.mofnet.nb_ft_y)
        yshape_c = (self.hy, self.wy, self.cfg.codecnet.nb_ft_y)

        if frame_type == FRAME_I:
            pred = jnp.zeros((1, self.hp, self.wp, 3), jnp.float32)
            skip = jnp.zeros_like(pred)
        else:
            z_qm = bs.decode_z_chunk(chunks["mofnet_z"], zshape_m,
                                     self.z_rows["mofnet"])
            z_qm_dev = jnp.asarray(z_qm, jnp.float32)[None]
            mu_m, bins_m = self._mof_hyper(p, z_qm_dev)
            y_cqm = bs.decode_y_chunk(chunks["mofnet_y"], yshape_m,
                                      np.asarray(bins_m)[0], self.laplace_rows)
            mof = self._mof_synth(p, jnp.asarray(y_cqm)[None], mu_m, prev,
                                  nxt, rate, ftype=frame_type)
            pred, skip = mof["pred"], mof["skip"]

        z_qc = bs.decode_z_chunk(chunks["codecnet_z"], zshape_c,
                                 self.z_rows["codecnet"])
        mu_c, bins_c = self._cod_hyper(p, jnp.asarray(z_qc, jnp.float32)[None])
        y_cqc = bs.decode_y_chunk(chunks["codecnet_y"], yshape_c,
                                  np.asarray(bins_c)[0], self.laplace_rows)
        x_hat = self._cod_synth(p, jnp.asarray(y_cqc)[None], mu_c, pred, skip,
                                rate, ftype=frame_type)
        return self._to_host_u8(self._cast_yuv(x_hat))

    # ------------------------------------------------------------------
    def video_header(self, nb_gop: int, idx_first: int, idx_last: int
                     ) -> bs.VideoHeader:
        return bs.VideoHeader(
            h_x=self.h, w_x=self.w, h_y=self.hy, w_y=self.wy,
            h_z=self.hz, w_z=self.wz, nb_gop=nb_gop,
            idx_first_frame=idx_first, idx_last_frame=idx_last)
