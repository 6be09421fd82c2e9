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
from aivc_tpu.coding import vrans
from aivc_tpu.coding.cdf import (
    build_laplace_table,
    build_z_table,
    sigma_to_bin_jnp,
)
from aivc_tpu.config import (
    FRAME_I,
    PAD_MULTIPLE,
    Y_DOWNSCALE,
    Z_DOWNSCALE,
    ModelConfig,
)
from aivc_tpu.models.fullnet import FullNet
from aivc_tpu.ops.layers import x444_to_yuv420, yuv420_to_444


def _os_env_warp() -> str:
    """AIVC_WARP_ENGINE=packed forces the gather warp (tuning/tests)."""
    import os

    return os.environ.get("AIVC_WARP_ENGINE", "auto")


def pad_to_multiple(x: np.ndarray, mult: int) -> np.ndarray:
    """Edge-pad H, W (axes 1, 2) of an NHWC array up to a multiple."""
    H, W = x.shape[1], x.shape[2]
    ph = (-H) % mult
    pw = (-W) % mult
    if ph or pw:
        x = np.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return x


class _BatchPlanes:
    """Batched device planes of one coded wave, pulled to host lazily and
    only once for all frames of the wave.

    The device side hands over ONE packed uint8 buffer [k, y+u+v bytes]
    (plus the plane shapes), so archiving a wave costs a single
    device->host transfer instead of three."""

    __slots__ = ("_dev", "_shapes", "_host")

    def __init__(self, packed_dev, shapes, eager_pull: bool = False):
        self._dev = packed_dev
        self._shapes = shapes
        self._host = None
        if eager_pull and packed_dev is not None:
            # Kick off the device->host DMA now, without blocking: a
            # 1080p GOP32 decode moves ~100 MB of planes, and pulling
            # them serially AFTER all compute finished left the link
            # idle during decode.  np.asarray in host() then completes
            # an already-started copy instead of starting one.  Only the
            # DECODE paths opt in — the encoder's closed-loop archive is
            # often never pulled, and an eager copy there would spend
            # relay bandwidth inside the encode window.
            try:
                packed_dev.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass  # backend without async copies: host() still works

    @classmethod
    def from_host_planes(cls, planes):
        self = cls(None, None)
        self._host = planes
        return self

    def host(self) -> Dict[str, np.ndarray]:
        if self._host is None:
            flat = np.asarray(self._dev)
            (hy_, wy_), (hc, wc) = self._shapes
            ny = hy_ * wy_
            nc = hc * wc
            k = flat.shape[0]
            self._host = {
                "y": flat[:, :ny].reshape(k, hy_, wy_, 1),
                "u": flat[:, ny:ny + nc].reshape(k, hc, wc, 1),
                "v": flat[:, ny + nc:].reshape(k, hc, wc, 1),
            }
            self._dev = None
        return self._host


class DecodedFrame:
    """A decoded frame.

    Holds the padded 444 device reference tensor (reused by dependent
    frames) and a handle into its wave's batched planes.  The host copy is
    fetched lazily on first access, so the coding loop never blocks on a
    frame's synthesis just to archive its pixels — host range coding of
    later frames overlaps device compute (async dispatch).
    """

    __slots__ = ("_batch", "_i", "ref")

    def __init__(self, batch: _BatchPlanes, i: int, ref: jax.Array):
        self._batch = batch
        self._i = i
        self.ref = ref

    @property
    def planes(self) -> Dict[str, np.ndarray]:
        h = self._batch.host()
        return {k: h[k][self._i, :, :, 0] for k in ("y", "u", "v")}

    def __getitem__(self, k: str) -> np.ndarray:
        return self.planes[k]

    @classmethod
    def from_host(cls, planes: Dict[str, np.ndarray],
                  ref: Optional[jax.Array] = None) -> "DecodedFrame":
        """Build from already-materialized host planes ([H, W] uint8)."""
        batch = _BatchPlanes.from_host_planes(
            {k: v[None, :, :, None] for k, v in planes.items()})
        return cls(batch, 0, ref)


class FrameCodec:
    """Per-resolution compiled codec around a FullNet parameter tree."""

    def __init__(self, cfg: ModelConfig, params, height: int, width: int,
                 debug: bool = False, mesh=None,
                 entropy_backend: str = "device",
                 rate_priority: bool = False,
                 audit: bool = False):
        import dataclasses as _dc
        import os as _os0

        # Lane-pack the synthesis output heads for inference (see
        # config.py:head_lane_pack / ops/layers.py:LanePackedConv): the
        # 24/12-channel head convs were the worst MXU stages at 1080p
        # (7-8% of peak, scripts/conv_probe.py).  Same parameters, same
        # math; enc/dec share the packed programs so the closed-loop
        # bit-exactness contract holds.  AIVC_PACKED_HEAD=0 restores the
        # plain conv.
        if _os0.environ.get("AIVC_PACKED_HEAD", "1") != "0":
            from aivc_tpu.ops.layers import head_lane_pack_auto

            cfg = _dc.replace(
                cfg,
                mofnet=_dc.replace(
                    cfg.mofnet,
                    head_lane_pack=head_lane_pack_auto(cfg.mofnet.out_c)),
                codecnet=_dc.replace(
                    cfg.codecnet,
                    head_lane_pack=head_lane_pack_auto(cfg.codecnet.out_c)))
        # Low-precision GDN parameters for bf16 codecs (AIVC_GDN_LOWP=0
        # restores the f32 path) — removes the f32 materialization of
        # x^2 in every GDN/IGDN (see config.py:gdn_lowp).
        if _os0.environ.get("AIVC_GDN_LOWP", "1") != "0":
            cfg = _dc.replace(
                cfg,
                mofnet=_dc.replace(cfg.mofnet, gdn_lowp=True),
                codecnet=_dc.replace(cfg.codecnet, gdn_lowp=True))
        # Channel-major MOFNet maps (see config.py:maps_cm): the
        # alpha/beta/flow maps live as [B, 6, H, W] planes end-to-end —
        # the full-res 6-channel NHWC layout was ~30% of the mof_synth
        # stage in pure relayout copies (scripts/trace_synth.py).
        # AIVC_MAPS_CM=0 restores the channel-last maps.
        if _os0.environ.get("AIVC_MAPS_CM", "1") != "0":
            cfg = _dc.replace(
                cfg, mofnet=_dc.replace(cfg.mofnet, maps_cm=True))
        # Space-to-depth first analysis convs (config.py:s2d_analysis):
        # the few-channel full-res stride-2 convs were the top single
        # ops of the synthesis/analysis stages.  AIVC_S2D=0 restores
        # the plain convs.
        if _os0.environ.get("AIVC_S2D", "1") != "0":
            cfg = _dc.replace(
                cfg,
                mofnet=_dc.replace(cfg.mofnet, s2d_analysis=True),
                codecnet=_dc.replace(cfg.codecnet, s2d_analysis=True))
        self.cfg = cfg
        # Rate audit: attach per-frame analytic bits (under the coder's
        # own quantized CDFs) to the encode stats, so sequence-level
        # estimated-vs-real overhead is reportable outside debug mode
        # (reference: src/real_life/encode.py:153-170).
        self.audit = audit
        # Rate-priority mode (RD sweeps): drop the scan-depth floor on the
        # stream count so the per-frame K-state flush shrinks to ~1% of
        # the payload even at the lowest ladder rates.  Encoder-private
        # policy — K is read back from the chunk header, so decoding is
        # unaffected.  Costs wall clock (deeper sequential rANS scans).
        self.rate_priority = rate_priority
        # Debug mode: per-chunk lossless self-check + estimated-vs-real
        # rate report (reference: bitstream.py:307-350).
        self.debug = debug
        # Latent-chunk entropy coding backend for ENCODING ('device' |
        # 'host'); decoding honours the bitstream's video-header flag, so
        # either codec decodes either format.  'device' runs the
        # vectorized rANS on the accelerator (coding/vrans.py) and only
        # moves compressed bytes across the host boundary; 'host' mirrors
        # the reference's split (latents pulled, coded by the C rANS).
        if entropy_backend not in ("device", "host"):
            raise ValueError(f"unknown entropy backend {entropy_backend!r}")
        self.backend = entropy_backend
        # v2 fused format: elide all-zero y feature maps on device
        # (AIVC_VRANS_ELIDE=0 falls back to the dense v1 stream).
        import os as _os

        self.elide = (entropy_backend == "device"
                      and _os.environ.get("AIVC_VRANS_ELIDE", "1") != "0")
        # Optional device mesh: frame rows are sharded over the 'spatial'
        # axis and GSPMD inserts the conv halo exchanges (SURVEY.md §2.5
        # "intra-frame tile parallelism").  Parameters are replicated.
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._frame_sharding = NamedSharding(
                mesh, P(None, "spatial", None, None))
            params = jax.device_put(params, NamedSharding(mesh, P()))
        else:
            # Checkpoints load as host numpy trees; pin them on device once
            # or every stage dispatch re-uploads the full parameter set.
            params = jax.device_put(params)
        self.params = params
        self.h, self.w = height, width
        self.hp = math.ceil(height / PAD_MULTIPLE) * PAD_MULTIPLE
        self.wp = math.ceil(width / PAD_MULTIPLE) * PAD_MULTIPLE
        self.h_uv, self.w_uv = math.ceil(height / 2), math.ceil(width / 2)
        self.hy, self.wy = self.hp // Y_DOWNSCALE, self.wp // Y_DOWNSCALE
        self.hz, self.wz = self.hp // Z_DOWNSCALE, self.wp // Z_DOWNSCALE
        # Per-chunk symbol counts (static shapes for the vrans programs).
        self._n_y = {
            "mofnet": self.hy * self.wy * cfg.mofnet.nb_ft_y,
            "codecnet": self.hy * self.wy * cfg.codecnet.nb_ft_y,
        }
        self._n_z = {
            "mofnet": self.hz * self.wz * cfg.mofnet.nb_ft_z,
            "codecnet": self.hz * self.wz * cfg.codecnet.nb_ft_z,
        }

        self.model = FullNet(cfg)

        # Motion-warp engine: flow_bound models route through the
        # windowed Pallas kernel on TPU (probe-gated with warp_packed
        # fallback); everything else uses the single-gather packed warp.
        import math as _math

        self._flow_bound_i = int(_math.ceil(getattr(cfg, "flow_bound", 0.0)
                                            or 0.0))
        self.warp_engine = "packed"
        if self._flow_bound_i > 0:
            from aivc_tpu.ops.warp import warp_bounded_runtime_ok
            from aivc_tpu.ops.warp_pallas import FB_MAX

            if (jax.default_backend() == "tpu"
                    and self._flow_bound_i <= FB_MAX
                    and _os_env_warp() != "packed"
                    and warp_bounded_runtime_ok(self._flow_bound_i)):
                self.warp_engine = "bounded"

        # Per-model entropy-coding alphabet: symbols live in
        # [-ac_max, ac_max - 1] and every CDF row is 2*ac_max wide.  256
        # mirrors the reference; narrower trained alphabets shrink the
        # one-hot CDF contractions (the TPU lookup cost) proportionally.
        self.ac_max = int(getattr(cfg, "ac_max_val", 256) or 256)
        if self.ac_max & (self.ac_max - 1) or not 16 <= self.ac_max <= 256:
            raise ValueError(
                f"ac_max_val must be a power of two in [16, 256], "
                f"got {self.ac_max}")
        self.n_symbols = 2 * self.ac_max

        # Integer CDF tables, built once per model load (the analogue of
        # reference _precompute_z_cdf, bitstream.py:82-125).
        from aivc_tpu.ops.entropy_models import FactorizedPrior

        self.laplace_rows = build_laplace_table(ac_max=self.ac_max)
        self.z_rows = {}
        # Device-backend tables at the vrans scale (2^16): one FUSED row
        # space [mofnet-z channels | codecnet-z channels | y sigma bins]
        # so a whole frame's latents ride ONE interleaved rANS stream
        # (per-frame overhead = one K-state flush instead of four).
        lap14 = build_laplace_table(scale=vrans.PROB_SCALE,
                                    ac_max=self.ac_max)
        z14 = {}
        for which in ("mofnet", "codecnet"):
            net_cfg = cfg.mofnet if which == "mofnet" else cfg.codecnet
            prior = FactorizedPrior(net_cfg.nb_ft_z)
            prior_params = {"params": params["params"][
                "mofnet" if which == "mofnet" else "codecnet"]["pdf_z"]}
            self.z_rows[which] = build_z_table(prior, prior_params,
                                               ac_max=self.ac_max)
            z14[which] = build_z_table(prior, prior_params,
                                       scale=vrans.PROB_SCALE,
                                       ac_max=self.ac_max)
        fused14 = np.concatenate(
            [z14["mofnet"], z14["codecnet"], lap14], axis=0)
        self._fused14 = fused14
        self.vr_enc = vrans.make_enc_tables(fused14)
        self.vr_dec = vrans.make_dec_tables(fused14)
        czm = cfg.mofnet.nb_ft_z
        czc = cfg.codecnet.nb_ft_z
        self._row_off = {"z_m": 0, "z_c": czm, "y": czm + czc}
        # Per-family pad symbol: most probable symbol of the family's
        # first row (identical on encoder and decoder by construction).
        freq14 = np.diff(fused14.astype(np.int64), axis=1)
        self._pad_sym = {
            f: int(np.argmax(freq14[off]))
            for f, off in self._row_off.items()
        }
        # Adaptive stream count: K for the next frame of each type comes
        # from the previous frame's measured word count (the decoder reads
        # K from the chunk header, so the policy is encoder-private).
        self._k_hint: Dict[int, int] = {}

        self._build_stage_fns()

    # ------------------------------------------------------------------
    def _fused_n(self, frame_type: int, k: int):
        """(total padded symbols, per-segment padded lengths) of a frame's
        fused stream at stream count k."""
        segs = []
        if frame_type != FRAME_I:
            segs.append(-(-self._n_z["mofnet"] // k) * k)
            segs.append(-(-self._n_y["mofnet"] // k) * k)
        segs.append(-(-self._n_z["codecnet"] // k) * k)
        segs.append(-(-self._n_y["codecnet"] // k) * k)
        return sum(segs), tuple(segs)

    def _fused_n2(self, frame_type: int, k: int, bm: int, bc: int):
        """Like _fused_n for the v2 (elided) format: y segments cover
        only the bucketed kept channels (absent entirely at bucket 0)."""
        hw = self.hy * self.wy
        segs = []
        if frame_type != FRAME_I:
            segs.append(-(-self._n_z["mofnet"] // k) * k)
            if bm:
                segs.append(-(-(bm * hw) // k) * k)
        segs.append(-(-self._n_z["codecnet"] // k) * k)
        if bc:
            segs.append(-(-(bc * hw) // k) * k)
        return sum(segs), tuple(segs)

    def _pick_k(self, frame_type: int, n_total: Optional[int] = None) -> int:
        """Stream count for the next frame of this type: sized so the
        4K-byte state flush stays ~<5% of the previous frame's payload,
        floored so the rANS scan stays <= 2048 steps — the sequential
        decode is LATENCY-bound per step, so deep scans dominate wall
        clock long before the state-flush overhead matters.
        Rate-priority mode relaxes the floor to 65536 steps and sizes K
        for ~1% flush overhead instead of ~5% (docs/STATUS.md: at the
        lowest ladder rates the 4 KB flush of K = 1024 can exceed the
        1080p payload itself).  AIVC_VRANS_K overrides (tests / tuning).

        Flush overhead math (ADVICE r1): K doubles while
        K * 2 * bytes_per_stream <= payload, and the flush costs 4 bytes
        per stream, so the ceiling is 4K / (2K * bps) = 2 / bps —
        bps = 200 -> ~1%, bps = 40 -> ~5%."""
        import os

        env_k = os.environ.get("AIVC_VRANS_K")
        if env_k:
            return int(env_k)
        if n_total is None:
            n_total, _ = self._fused_n(frame_type, 8)
        max_steps = 65536 if self.rate_priority else 2048
        bytes_per_stream = 200 if self.rate_priority else 40
        k_lo = 8
        while n_total // k_lo > max_steps:
            k_lo *= 2
        hint = self._k_hint.get(frame_type)
        if hint is None:
            k = 8 if self.rate_priority else vrans.pick_k(n_total)
        else:
            k = 8
            while k < vrans.K_MAX and k * 2 * bytes_per_stream <= hint:
                k *= 2
        return max(k_lo, min(k, vrans.K_MAX))

    def _update_k_hint(self, frame_type: int, payload_bytes: int):
        prev = self._k_hint.get(frame_type)
        cur = payload_bytes
        self._k_hint[frame_type] = (
            cur if prev is None else (prev + cur) // 2)

    # ------------------------------------------------------------------
    def _build_stage_fns(self):
        model = self.model
        # Plain Python ints (NOT jnp scalars — see coding/vrans.py note).
        ACV = self.ac_max
        NSYM = self.n_symbols

        def apply(method, *args, **kw):
            return model.apply(self.params, *args, method=method, **kw)

        @jax.jit
        def to444(y, u, v):
            return yuv420_to_444(y, u, v)

        def _pad_dev(x, mult):
            ph = (-x.shape[1]) % mult
            pw = (-x.shape[2]) % mult
            if ph or pw:
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
            return x

        def _pad_ref_from_planes(y_u8, u_u8, v_u8):
            y = _pad_dev(y_u8.astype(jnp.float32) / 255.0, PAD_MULTIPLE)
            u = _pad_dev(u_u8.astype(jnp.float32) / 255.0, PAD_MULTIPLE // 2)
            v = _pad_dev(v_u8.astype(jnp.float32) / 255.0, PAD_MULTIPLE // 2)
            return yuv420_to_444(y, u, v)

        def _cast_body(x444):
            """Crop to true size, 444->420, quantize to 256 levels
            (reference cast_before_png_saving, img_processing.py:31-75),
            and rebuild the padded 444 reference from the quantized planes
            so future frames predict from exactly what the decoder has.
            Output planes are packed into one uint8 buffer per frame so
            the host archives a wave with a single transfer."""
            yf, uf, vf = x444_to_yuv420(x444)
            yf = yf[:, : self.h, : self.w, :]
            uf = uf[:, : self.h_uv, : self.w_uv, :]
            vf = vf[:, : self.h_uv, : self.w_uv, :]
            out = {}
            for k, p in (("y", yf), ("u", uf), ("v", vf)):
                out[k] = jnp.clip(jnp.round(jnp.clip(p, 0.0, 1.0) * 255.0),
                                  0, 255).astype(jnp.uint8)
            ref444 = _pad_ref_from_planes(out["y"], out["u"], out["v"])
            B = x444.shape[0]
            packed = jnp.concatenate(
                [out["y"].reshape(B, -1), out["u"].reshape(B, -1),
                 out["v"].reshape(B, -1)], axis=1)
            return packed, ref444

        cast_yuv = jax.jit(_cast_body)

        @jax.jit
        def planes_to_ref(y_u8, u_u8, v_u8):
            """uint8 true-size planes -> padded float 444 reference.
            Shared by encoder and decoder so reference tensors are
            bit-identical on both sides."""
            return _pad_ref_from_planes(y_u8, u_u8, v_u8)


        @functools.partial(jax.jit, static_argnames=("ftype",))
        def mof_analyze(params, frame, prev, nxt, idx_rate, ftype):
            y, z_q = model.apply(params, frame, prev, nxt, idx_rate, ftype,
                                 method=FullNet.mof_analyze)
            # Clamp z to the CODING alphabet (the model clips at the
            # default +-256; a narrower ac_max must clamp here so the
            # encoder's hyper stage sees exactly the decoded values).
            return y, jnp.clip(z_q, -ACV, ACV - 1)

        @functools.partial(jax.jit, static_argnames=("ftype",))
        def cod_analyze(params, frame, pred, idx_rate, ftype):
            y, z_q = model.apply(params, frame, pred, idx_rate, ftype,
                                 method=FullNet.cod_analyze)
            return y, jnp.clip(z_q, -ACV, ACV - 1)

        @jax.jit
        def mof_hyper(params, z_q):
            mu, sigma = model.apply(params, z_q, method=FullNet.mofnet_hyper)
            return mu, sigma_to_bin_jnp(sigma).astype(jnp.uint8)

        @jax.jit
        def cod_hyper(params, z_q):
            mu, sigma = model.apply(params, z_q, method=FullNet.codecnet_hyper)
            return mu, sigma_to_bin_jnp(sigma).astype(jnp.uint8)

        @jax.jit
        def y_quant(y, mu):
            """Quantize y and prepare both int16 and int8 host views: the
            int8 one (half the tunnel transfer) is valid whenever every
            value fits [-128, 127], which is nearly always for trained
            models; the host checks the 1-byte flag and pulls only one."""
            q = jnp.clip(jnp.round(y - mu), -ACV, ACV - 1)
            q16 = q.astype(jnp.int16)
            fits8 = jnp.all(jnp.abs(q) <= 127).astype(jnp.uint8)
            return q16, q.astype(jnp.int8), fits8

        @jax.jit
        def y_quant_dev(y, mu):
            """Device-backend variant: latents never leave the device, so
            the int8 view and its fits-in-8-bit reduction are dead work —
            jit outputs are always materialized, so they must not be
            outputs at all.  Returns the same (q16, ...) tuple shape with
            None placeholders (callers index [0])."""
            q = jnp.clip(jnp.round(y - mu), -ACV, ACV - 1)
            return (q.astype(jnp.int16),)

        @functools.partial(jax.jit, static_argnames=("ftype",))
        def mof_synth_maps(params, y_cq, mu, prev, nxt, idx_rate, ftype):
            return model.apply(params, y_cq.astype(jnp.float32), mu, prev,
                               nxt, idx_rate, ftype,
                               method=FullNet.mofnet_synth_maps)

        WENG = self.warp_engine
        WFB = self._flow_bound_i

        @functools.partial(jax.jit, static_argnames=("ftype",))
        def motion_comp(prev, nxt, alpha, beta, v_prev, v_next, ftype):
            return FullNet.motion_comp_stage(prev, nxt, alpha, beta,
                                             v_prev, v_next, ftype,
                                             warp_engine=WENG,
                                             flow_bound=WFB)

        @functools.partial(jax.jit, static_argnames=("ftype",))
        def motion_comp_cm(prev, nxt, maps6, ftype):
            return FullNet.motion_comp_stage_cm(prev, nxt, maps6, ftype,
                                                warp_engine=WENG,
                                                flow_bound=WFB)

        if self.cfg.mofnet.maps_cm:
            def mof_synth(params, y_cq, mu, prev, nxt, idx_rate, ftype):
                """Two-program split, channel-major maps: synthesis ->
                [B, 6, H, W] planes, then the warp (config.py:maps_cm)."""
                maps6 = mof_synth_maps(params, y_cq, mu, prev, nxt,
                                       idx_rate, ftype=ftype)
                return motion_comp_cm(prev, nxt, maps6, ftype=ftype)
        else:
            def mof_synth(params, y_cq, mu, prev, nxt, idx_rate, ftype):
                """Two-program split: synthesis maps, then the warp (see
                FullNet.mofnet_synth_maps docstring)."""
                alpha, beta, v_prev, v_next = mof_synth_maps(
                    params, y_cq, mu, prev, nxt, idx_rate, ftype=ftype)
                return motion_comp(prev, nxt, alpha, beta, v_prev,
                                   v_next, ftype=ftype)

        @functools.partial(jax.jit, static_argnames=("ftype",))
        def cod_synth(params, y_cq, mu, pred, skip, idx_rate, ftype):
            """Synthesis fused with the YUV cast + reference rebuild (one
            device program; shared by encoder and decoder)."""
            x_hat = model.apply(params, y_cq.astype(jnp.float32), mu, pred,
                                skip, idx_rate, ftype,
                                method=FullNet.codecnet_synth)
            return _cast_body(x_hat)

        # ---- device-backend FUSED entropy coding (coding/vrans.py): a
        # frame's segments [z_m, y_m, z_c, y_c] (each padded to a multiple
        # of K) ride one interleaved rANS stream; decoding happens in
        # stages with the (states, word-offset) carry staying on device.
        OFF = self._row_off
        PAD = self._pad_sym

        def _pad_seg(sym, rows, k, pad_sym, pad_row):
            pad = (-sym.shape[1]) % k
            if pad:
                sym = jnp.pad(sym, ((0, 0), (0, pad)),
                              constant_values=pad_sym)
                rows = jnp.pad(rows, ((0, 0), (0, pad)),
                               constant_values=pad_row)
            return sym, rows

        def _z_seg(zq, fam, k):
            B, H, W, C = zq.shape
            n = H * W * C
            sym = (zq.astype(jnp.int32) + ACV).reshape(B, n)
            rows = jnp.broadcast_to(
                jnp.arange(C, dtype=jnp.int32) + OFF[fam],
                (H, W, C)).reshape(1, n)
            rows = jnp.broadcast_to(rows, (B, n))
            return _pad_seg(sym, rows, k, PAD[fam], OFF[fam])

        def _y_seg(q16, bins, k):
            B = q16.shape[0]
            sym = (q16.astype(jnp.int32) + ACV).reshape(B, -1)
            rows = bins.astype(jnp.int32).reshape(B, -1) + OFF["y"]
            return _pad_seg(sym, rows, k, PAD["y"], OFF["y"])

        def _enc_fused(parts, tables, k):
            sym = jnp.concatenate([p[0] for p in parts], axis=1)
            rows = jnp.concatenate([p[1] for p in parts], axis=1)
            n = sym.shape[1]
            segs = tuple(p[0].shape[1] // k for p in parts)
            return jax.vmap(lambda s, r: vrans.encode_impl(
                s, r, tables, n=n, k=k, n_sym=NSYM,
                pad_sym=PAD["z_c"], segment_steps=segs))(sym, rows)

        @functools.partial(jax.jit, static_argnames=("k",))
        def vrenc_fused_pb(z_qm, q16m, binsm, z_qc, q16c, binsc, tables, k):
            parts = [_z_seg(z_qm, "z_m", k), _y_seg(q16m, binsm, k),
                     _z_seg(z_qc, "z_c", k), _y_seg(q16c, binsc, k)]
            return _enc_fused(parts, tables, k)

        @functools.partial(jax.jit, static_argnames=("k",))
        def vrenc_fused_i(z_qc, q16c, binsc, tables, k):
            parts = [_z_seg(z_qc, "z_c", k), _y_seg(q16c, binsc, k)]
            return _enc_fused(parts, tables, k)

        # Pallas-encode variants: same fused stream, produced by the
        # VMEM-resident kernel (vrans.encode_pallas_batch) — bit-identical
        # words; only the buffer layout differs (words end at g0, the
        # per-segment start cursors come back as seg_g).
        def _enc_fused_pal(parts, cdf512, k, interpret):
            sym = jnp.concatenate([p[0] for p in parts], axis=1)
            rows = jnp.concatenate([p[1] for p in parts], axis=1)
            segs = tuple(p[0].shape[1] // k for p in parts)
            return vrans.encode_pallas_batch(
                sym, rows, cdf512, n=sym.shape[1], k=k,
                pad_sym=PAD["z_c"], segment_steps=segs, interpret=interpret)

        @functools.partial(jax.jit, static_argnames=("k", "interpret"))
        def vrenc_fused_pb_pal(z_qm, q16m, binsm, z_qc, q16c, binsc,
                               cdf512, k, interpret=False):
            parts = [_z_seg(z_qm, "z_m", k), _y_seg(q16m, binsm, k),
                     _z_seg(z_qc, "z_c", k), _y_seg(q16c, binsc, k)]
            return _enc_fused_pal(parts, cdf512, k, interpret)

        @functools.partial(jax.jit, static_argnames=("k", "interpret"))
        def vrenc_fused_i_pal(z_qc, q16c, binsc, cdf512, k,
                              interpret=False):
            parts = [_z_seg(z_qc, "z_c", k), _y_seg(q16c, binsc, k)]
            return _enc_fused_pal(parts, cdf512, k, interpret)

        @functools.partial(jax.jit, static_argnames=("end", "m"))
        def window_cols(buf, end, m):
            """buf[:, end-m:end] — the words of a descending-cursor encode
            live at [g_final, g0), NOT at the buffer end (alignment slack
            sits above g0)."""
            return buf[:, end - m:end]

        @functools.partial(jax.jit,
                           static_argnames=("n", "k", "shape", "off"))
        def vrdec_seg_z(words, states, g0, tables, n, k, shape, off):
            """Decode one z segment (n = padded length) with carry."""
            B = words.shape[0]
            nraw = shape[0] * shape[1] * shape[2]
            rows = jnp.broadcast_to(
                jnp.arange(shape[-1], dtype=jnp.int32) + off,
                shape).reshape(1, nraw)
            rows = jnp.broadcast_to(rows, (B, nraw))
            rows = jnp.pad(rows, ((0, 0), (0, n - nraw)),
                           constant_values=off)
            syms, st, g = vrans.decode_batch(
                words, states, rows, tables, n=n, k=k, g0=g0,
                return_carry=True)
            # float32, matching the encoder's z_q dtype so hyper-synthesis
            # is the same compiled program on both sides.
            z = (syms[:, :nraw] - ACV).astype(jnp.float32).reshape(
                (B,) + shape)
            return z, st, g

        @functools.partial(jax.jit, static_argnames=("n", "k", "shape"))
        def vrdec_seg_y(words, states, g0, bins, tables, n, k, shape):
            B = words.shape[0]
            nraw = shape[0] * shape[1] * shape[2]
            rows = bins.astype(jnp.int32).reshape(B, nraw) + OFF["y"]
            rows = jnp.pad(rows, ((0, 0), (0, n - nraw)),
                           constant_values=OFF["y"])
            syms, st, g = vrans.decode_batch(
                words, states, rows, tables, n=n, k=k, g0=g0,
                return_carry=True)
            # int16, matching the encoder's q16 so synthesis is shared.
            y = (syms[:, :nraw] - ACV).astype(jnp.int16).reshape(
                (B,) + shape)
            return y, st, g

        @functools.partial(jax.jit, static_argnames=("m",))
        def prefix_cols(buf, m):
            return buf[:, :m]

        # ---- v2 (elided) fused coding: all-zero y feature maps are
        # dropped from the stream (the device analogue of the reference's
        # zero-feature-map elision, bitstream.py:237-255).  Trained models
        # keep only ~10-30% of y channels, so this cuts the sequential
        # rANS scan depth ~5x AND removes the dense zero-coding rate
        # floor.  Per-frame channel bitmaps ride in the chunk; the
        # wave-shared gather bucket derives from the bitmaps on BOTH
        # sides (vrans.elide_bucket), so enc/dec remain bit-exact and a
        # batched wave keeps one compiled program.  All gathers/scatters
        # are one-hot matmuls (values <= 2^9: exact in f32).

        @jax.jit
        def chan_mask(q16):
            """[B, H, W, C] -> bool [B, C]: channel has any nonzero."""
            return jnp.any(q16 != 0, axis=(1, 2))

        def _oh(idx, c):
            """[B, J] indices -> one-hot f32 [B, J, C]."""
            return (idx[:, :, None] ==
                    jnp.arange(c, dtype=jnp.int32)[None, None, :]
                    ).astype(jnp.float32)

        def _gather_ch(x, idx, bucket):
            """Gather kept channels: x [B,H,W,C] -> i32 [B, bucket, H*W]
            via a one-hot MXU contraction (no TPU gather)."""
            B, H, W, C = x.shape
            xt = x.astype(jnp.float32).transpose(0, 3, 1, 2).reshape(
                B, C, H * W)
            oh = _oh(idx, C)                          # [B, bucket, C]
            out = jax.lax.dot_general(
                oh, xt, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST)  # [B, bucket, HW]
            return out.astype(jnp.int32)

        def _y_seg_el(q16, bins, idx, nkeep, k, bucket):
            """Elided y segment: channel-major symbols of the kept
            channels; per-frame slots beyond nkeep carry the pad
            symbol (identical construction on the decode side)."""
            B, H, W, C = q16.shape
            hw = H * W
            sym = _gather_ch(q16, idx, bucket).reshape(B, bucket * hw) \
                + ACV
            rows = _gather_ch(bins, idx, bucket).reshape(B, bucket * hw) \
                + OFF["y"]
            pos_ch = jnp.arange(bucket * hw, dtype=jnp.int32) // hw
            valid = pos_ch[None, :] < nkeep[:, None]
            sym = jnp.where(valid, sym, PAD["y"])
            rows = jnp.where(valid, rows, OFF["y"])
            return _pad_seg(sym, rows, k, PAD["y"], OFF["y"])

        def _parts_v2(z_qm, q16m, binsm, idxm, nkm,
                      z_qc, q16c, binsc, idxc, nkc, k, bm, bc):
            parts = []
            if z_qm is not None:
                parts.append(_z_seg(z_qm, "z_m", k))
                if bm:
                    parts.append(_y_seg_el(q16m, binsm, idxm, nkm, k, bm))
            parts.append(_z_seg(z_qc, "z_c", k))
            if bc:
                parts.append(_y_seg_el(q16c, binsc, idxc, nkc, k, bc))
            return parts

        @functools.partial(jax.jit, static_argnames=("k", "bm", "bc"))
        def vrenc2_pb(z_qm, q16m, binsm, idxm, nkm,
                      z_qc, q16c, binsc, idxc, nkc, tables, k, bm, bc):
            return _enc_fused(_parts_v2(z_qm, q16m, binsm, idxm, nkm,
                                        z_qc, q16c, binsc, idxc, nkc,
                                        k, bm, bc), tables, k)

        @functools.partial(jax.jit, static_argnames=("k", "bc"))
        def vrenc2_i(z_qc, q16c, binsc, idxc, nkc, tables, k, bc):
            return _enc_fused(_parts_v2(None, None, None, None, None,
                                        z_qc, q16c, binsc, idxc, nkc,
                                        k, 0, bc), tables, k)

        @functools.partial(jax.jit,
                           static_argnames=("k", "bm", "bc", "interpret"))
        def vrenc2_pb_pal(z_qm, q16m, binsm, idxm, nkm,
                          z_qc, q16c, binsc, idxc, nkc, cdf512, k, bm, bc,
                          interpret=False):
            return _enc_fused_pal(_parts_v2(z_qm, q16m, binsm, idxm, nkm,
                                            z_qc, q16c, binsc, idxc, nkc,
                                            k, bm, bc),
                                  cdf512, k, interpret)

        @functools.partial(jax.jit,
                           static_argnames=("k", "bc", "interpret"))
        def vrenc2_i_pal(z_qc, q16c, binsc, idxc, nkc, cdf512, k, bc,
                         interpret=False):
            return _enc_fused_pal(_parts_v2(None, None, None, None, None,
                                            z_qc, q16c, binsc, idxc, nkc,
                                            k, 0, bc),
                                  cdf512, k, interpret)

        @functools.partial(jax.jit,
                           static_argnames=("n", "k", "shape", "bucket"))
        def vrdec_seg_y_el(words, states, g0, bins, idx, nkeep, tables,
                           n, k, shape, bucket):
            """Decode one elided y segment and scatter it back to the
            dense [B, H, W, C] layout (one-hot matmul, no TPU scatter)."""
            B = words.shape[0]
            H, W, C = shape
            hw = H * W
            rows = _gather_ch(bins, idx, bucket).reshape(B, bucket * hw) \
                + OFF["y"]
            pos_ch = jnp.arange(bucket * hw, dtype=jnp.int32) // hw
            valid = pos_ch[None, :] < nkeep[:, None]
            rows = jnp.where(valid, rows, OFF["y"])
            rows = jnp.pad(rows, ((0, 0), (0, n - bucket * hw)),
                           constant_values=OFF["y"])
            syms, st, g = vrans.decode_batch(
                words, states, rows, tables, n=n, k=k, g0=g0,
                return_carry=True)
            yk = (syms[:, :bucket * hw] - ACV).astype(jnp.float32)
            yk = jnp.where(valid, yk, 0.0).reshape(B, bucket, hw)
            # dense[c] = sum_j onehot(idx_j == c) * yk_j ; padded slots
            # are zeroed above so a padded idx of 0 contributes nothing.
            oh = _oh(idx, C)                          # [B, bucket, C]
            dense = jax.lax.dot_general(
                oh, yk, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST)  # [B, C, hw]
            y = dense.astype(jnp.int16).reshape(B, C, H, W).transpose(
                0, 2, 3, 1)
            return y, st, g

        self._chan_mask = chan_mask
        self._vrenc2_pb = vrenc2_pb
        self._vrenc2_i = vrenc2_i
        self._vrenc2_pb_pal = vrenc2_pb_pal
        self._vrenc2_i_pal = vrenc2_i_pal
        self._vrdec_seg_y_el = vrdec_seg_y_el

        self._vrenc_fused_pb = vrenc_fused_pb
        self._vrenc_fused_i = vrenc_fused_i
        self._vrenc_fused_pb_pal = vrenc_fused_pb_pal
        self._vrenc_fused_i_pal = vrenc_fused_i_pal
        self._window_cols = window_cols
        self._vrdec_seg_z = vrdec_seg_z
        self._vrdec_seg_y = vrdec_seg_y
        self._prefix_cols = prefix_cols

        self._to444 = to444
        self._planes_to_ref = planes_to_ref
        self._cast_yuv = cast_yuv
        self._mof_analyze = mof_analyze
        self._cod_analyze = cod_analyze
        self._mof_hyper = mof_hyper
        self._cod_hyper = cod_hyper
        self._y_quant = (y_quant_dev if self.backend == "device"
                         else y_quant)
        self._mof_synth = mof_synth
        self._mof_synth_maps = mof_synth_maps
        self._motion_comp = (motion_comp_cm if self.cfg.mofnet.maps_cm
                             else motion_comp)
        self._cod_synth = cod_synth

        # ---- analytic-rate audit (reference: src/real_life/encode.py:
        # 153-170 reports sequence-level estimated-vs-real rate overhead).
        # Bits under the SAME quantized integer CDFs the coder uses, so
        # the audit isolates pure container overhead (padding, state
        # flush, headers, chunk framing) from model misestimation.
        OFF_A = self._row_off
        cdf14 = jnp.asarray(self._fused14.astype(np.int32))

        def _abits(sym, rows):
            lo = cdf14[rows, sym]
            hi = cdf14[rows, sym + 1]
            p = (hi - lo).astype(jnp.float32) / float(vrans.PROB_SCALE)
            return -jnp.log2(jnp.maximum(p, 2.0 ** -16))

        def _z_abits(zq, fam):
            B, H, W, C = zq.shape
            sym = (zq.astype(jnp.int32) + ACV).reshape(B, -1)
            rows = jnp.broadcast_to(
                jnp.arange(C, dtype=jnp.int32) + OFF_A[fam],
                (H, W, C)).reshape(1, -1)
            rows = jnp.broadcast_to(rows, sym.shape)
            return _abits(sym, rows).sum(axis=1)

        def _y_abits(y, bins):
            B, H, W, C = y.shape
            # Zero feature maps are elided by both backends; they cost
            # nothing in the real stream, so exclude them here too.
            mask = (jnp.abs(y).sum(axis=(1, 2)) != 0).astype(jnp.float32)
            sym = (y.astype(jnp.int32) + ACV).reshape(B, -1)
            rows = bins.astype(jnp.int32).reshape(B, -1) + OFF_A["y"]
            w = jnp.broadcast_to(mask[:, None, None, :],
                                 (B, H, W, C)).reshape(B, -1)
            return (_abits(sym, rows) * w).sum(axis=1)

        @jax.jit
        def audit_i(z_qc, y_cqc, bins_c):
            return _z_abits(z_qc, "z_c") + _y_abits(y_cqc, bins_c)

        @jax.jit
        def audit_pb(z_qm, y_cqm, bins_m, z_qc, y_cqc, bins_c):
            return (_z_abits(z_qm, "z_m") + _y_abits(y_cqm, bins_m)
                    + _z_abits(z_qc, "z_c") + _y_abits(y_cqc, bins_c))

        self._audit_i = audit_i
        self._audit_pb = audit_pb

    # ------------------------------------------------------------------
    # Host <-> device frame conversion
    # ------------------------------------------------------------------
    def ref_to_444(self, frame_u8: Optional[Dict[str, np.ndarray]]) -> jax.Array:
        """uint8 YUV420 planes (true size) -> padded float 444 on device.
        None -> the all-zero dummy reference (reference: decode.py:256-270)."""
        if frame_u8 is None:
            return self._zero_ref()
        y = jnp.asarray(frame_u8["y"][None, :, :, None])
        u = jnp.asarray(frame_u8["u"][None, :, :, None])
        v = jnp.asarray(frame_u8["v"][None, :, :, None])
        ref = self._planes_to_ref(y, u, v)
        if self.mesh is not None:
            ref = jax.device_put(ref, self._frame_sharding)
        return ref

    def _shard_batch(self, x: jax.Array) -> jax.Array:
        """Lay a [B, Hp, Wp, C] wave batch over the mesh: batch over
        'data' (when B divides it) AND rows over 'spatial' — the combined
        data x spatial placement of SURVEY.md §2.5.  Falls back to
        rows-only for indivisible batches.  GSPMD keeps per-element
        results identical to the unsharded program (asserted bit-exact by
        tests/test_parallel.py)."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        nd = self.mesh.shape.get("data", 1)
        if nd > 1 and x.shape[0] % nd == 0:
            return jax.device_put(
                x, NamedSharding(self.mesh, P("data", "spatial", None, None)))
        return jax.device_put(x, self._frame_sharding)

    def _zero_ref(self) -> jax.Array:
        if not hasattr(self, "_zero_ref_cache"):
            self._zero_ref_cache = jnp.zeros(
                (1, self.hp, self.wp, 3), jnp.float32)
        return self._zero_ref_cache

    # ------------------------------------------------------------------
    # Chunk coding with optional debug self-verification
    # ------------------------------------------------------------------
    def _encode_z(self, which: str, z_np: np.ndarray, label: str) -> bytes:
        chunk = bs.encode_z_chunk(z_np, self.z_rows[which])
        if self.debug:
            from aivc_tpu.coding.cdf import expected_bits

            H, W, C = z_np.shape
            rows = np.broadcast_to(np.arange(C, dtype=np.int32), (H, W, C))
            est = expected_bits((z_np + self.ac_max).astype(np.int64),
                                rows, self.z_rows[which]) / 8.0
            back = bs.decode_z_chunk(chunk, z_np.shape, self.z_rows[which])
            lossless = np.array_equal(back, z_np)
            print(f"[AC] {label}: {len(chunk)}B real, {est:.1f}B analytic, "
                  f"overhead {100 * (len(chunk) / max(est, 1e-9) - 1):.2f}%, "
                  f"{'lossless Ok!' if lossless else 'NOT LOSSLESS Ko!'}")
            if not lossless:
                raise AssertionError(f"entropy coding not lossless: {label}")
        return chunk

    def _encode_y(self, y_np: np.ndarray, bins_np: np.ndarray,
                  label: str) -> bytes:
        chunk = bs.encode_y_chunk(y_np, bins_np, self.laplace_rows)
        if self.debug:
            from aivc_tpu.coding.cdf import expected_bits

            nz = np.where(np.abs(y_np).sum(axis=(0, 1)) != 0)[0]
            est = (expected_bits(
                (y_np[:, :, nz] + self.ac_max).astype(np.int64),
                bins_np[:, :, nz], self.laplace_rows) / 8.0
                if len(nz) else 0.0)
            back = bs.decode_y_chunk(chunk, y_np.shape, bins_np,
                                     self.laplace_rows)
            lossless = np.array_equal(back, y_np)
            print(f"[AC] {label}: {len(chunk)}B real, {est:.1f}B analytic, "
                  f"{len(nz)}/{y_np.shape[2]} ft maps, "
                  f"{'lossless Ok!' if lossless else 'NOT LOSSLESS Ko!'}")
            if not lossless:
                raise AssertionError(f"entropy coding not lossless: {label}")
        return chunk

    # ------------------------------------------------------------------
    # Frame encode / decode
    # ------------------------------------------------------------------
    def _stack_refs(self, refs) -> jax.Array:
        """List of (device [1,Hp,Wp,3] ref | None) -> [k,Hp,Wp,3] batch."""
        arrs = [r if r is not None else self._zero_ref() for r in refs]
        return arrs[0] if len(arrs) == 1 else jnp.concatenate(arrs, axis=0)

    def _split_decoded(self, packed_dev, ref444, k: int,
                       eager_pull: bool = False):
        batch = _BatchPlanes(packed_dev,
                             ((self.h, self.w), (self.h_uv, self.w_uv)),
                             eager_pull=eager_pull)
        if k == 1:
            return [DecodedFrame(batch, 0, ref444)]
        return [DecodedFrame(batch, i, ref444[i:i + 1]) for i in range(k)]

    @staticmethod
    def _pull_y(yq) -> np.ndarray:
        """Pull quantized y from device, preferring the int8 view."""
        y16, y8, fits8 = yq
        if bool(np.asarray(fits8)):
            return np.asarray(y8).astype(np.int16)
        return np.asarray(y16)

    @staticmethod
    def _par_map(fn, items):
        """Map over a wave's chunks in threads (the C range coder releases
        the GIL); sequential for a single item."""
        if len(items) <= 1:
            return [fn(it) for it in items]
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(4, len(items))) as ex:
            return list(ex.map(fn, items))

    def encode_frames_launch(self, frames_u8, prev_refs, next_refs,
                             frame_type: int, idx_rate: float):
        """Queue the ENTIRE device DAG of one wave and return handles.

        The encoder's device graph never depends on host range-coding
        results, so whole GOPs can be queued before any host work: the
        caller launches every wave (device-side refs flow between them),
        then finishes host entropy coding per wave while the device runs
        ahead (encode_frames_finish)."""
        k = len(frames_u8)
        p = self.params
        frame = jnp.concatenate([self.ref_to_444(f) for f in frames_u8], axis=0) \
            if k > 1 else self.ref_to_444(frames_u8[0])
        prev = self._stack_refs(prev_refs)
        nxt = self._stack_refs(next_refs)
        if self.mesh is not None:
            frame = self._shard_batch(frame)
            prev = self._shard_batch(prev)
            nxt = self._shard_batch(nxt)
        rate = jnp.float32(idx_rate)

        if frame_type == FRAME_I:
            pred = jnp.zeros_like(frame)
            skip = jnp.zeros_like(frame)
            mof = None
            z_qm = y_cqm = bins_m = None
        else:
            y_m, z_qm = self._mof_analyze(p, frame, prev, nxt, rate,
                                          ftype=frame_type)
            mu_m, bins_m = self._mof_hyper(p, z_qm)
            y_cqm = self._y_quant(y_m, mu_m)
            mof = self._mof_synth(p, y_cqm[0], mu_m, prev, nxt, rate,
                                  ftype=frame_type)
            pred, skip = mof["pred"], mof["skip"]

        y_c, z_qc = self._cod_analyze(p, frame, pred, rate, ftype=frame_type)
        mu_c, bins_c = self._cod_hyper(p, z_qc)
        y_cqc = self._y_quant(y_c, mu_c)
        planes_dev, ref444 = self._cod_synth(p, y_cqc[0], mu_c, pred, skip,
                                             rate, ftype=frame_type)

        decoded = self._split_decoded(planes_dev, ref444, k)
        handles = {
            "k": k, "frame_type": frame_type,
            "z_qm": z_qm, "y_cqm": y_cqm, "bins_m": bins_m, "mof": mof,
            "z_qc": z_qc, "y_cqc": y_cqc, "bins_c": bins_c,
            "decoded": decoded,
        }
        if self.audit:
            handles["abits"] = (
                self._audit_i(z_qc, y_cqc[0], bins_c)
                if frame_type == FRAME_I else
                self._audit_pb(z_qm, y_cqm[0], bins_m,
                               z_qc, y_cqc[0], bins_c))
        if self.backend == "device" and self.elide:
            # v2 path: queue only the per-channel nonzero masks here; the
            # fused encode launches in encode_frames_finish once the
            # masks (a few dozen bytes) are on host — the gather bucket
            # is a static specialization, so it must be known before the
            # encode program can be picked.
            handles["mask_m"] = (None if frame_type == FRAME_I
                                 else self._chan_mask(y_cqm[0]))
            handles["mask_c"] = self._chan_mask(y_cqc[0])
        elif self.backend == "device":
            # Queue the on-device FUSED entropy coding of the whole frame
            # right behind the transforms — still zero host sync; the
            # host later pulls only compressed words.
            kk = self._pick_k(frame_type)
            n_total, _ = self._fused_n(frame_type, kk)
            pal = self._use_pallas_enc(n_total, kk)
            if pal:
                interp = pal == "interpret"
                cdf512 = self.vr_dec.cdf512_f32
                if frame_type == FRAME_I:
                    res = self._vrenc_fused_i_pal(z_qc, y_cqc[0], bins_c,
                                                  cdf512, k=kk,
                                                  interpret=interp)
                else:
                    res = self._vrenc_fused_pb_pal(z_qm, y_cqm[0], bins_m,
                                                   z_qc, y_cqc[0], bins_c,
                                                   cdf512, k=kk,
                                                   interpret=interp)
                handles["vr"] = {"res": res, "k": kk, "fmt": "pallas",
                                 "cols": ([2, 3] if frame_type == FRAME_I
                                          else [0, 1, 2, 3])}
            else:
                if frame_type == FRAME_I:
                    res = self._vrenc_fused_i(z_qc, y_cqc[0], bins_c,
                                              self.vr_enc, k=kk)
                else:
                    res = self._vrenc_fused_pb(z_qm, y_cqm[0], bins_m,
                                               z_qc, y_cqc[0], bins_c,
                                               self.vr_enc, k=kk)
                handles["vr"] = {"res": res, "k": kk, "fmt": "xla",
                                 "cols": ([2, 3] if frame_type == FRAME_I
                                          else [0, 1, 2, 3])}
        return handles

    def _launch_vr2(self, handles):
        """v2 host half: pull the channel masks (a few dozen bytes —
        the ONLY extra sync of the elided format), derive the wave-shared
        buckets + per-frame kept-channel indices, and launch the fused
        device encode at the right static specialization."""
        frame_type = handles["frame_type"]
        k = handles["k"]
        cm = self.cfg.mofnet.nb_ft_y
        cc = self.cfg.codecnet.nb_ft_y
        mask_c = np.asarray(handles["mask_c"])
        mask_m = (np.asarray(handles["mask_m"])
                  if handles.get("mask_m") is not None else None)
        bc = vrans.elide_bucket(int(mask_c.sum(axis=1).max()), cc)
        bm = (vrans.elide_bucket(int(mask_m.sum(axis=1).max()), cm)
              if mask_m is not None else 0)

        def pack_idx(mask, bucket):
            idx = np.zeros((k, max(bucket, 1)), np.int32)
            nk = np.zeros((k,), np.int32)
            for i in range(k):
                ch = np.nonzero(mask[i])[0]
                nk[i] = ch.size
                idx[i, :ch.size] = ch
            return jnp.asarray(idx), jnp.asarray(nk)

        idxc, nkc = pack_idx(mask_c, bc)
        idxm = nkm = None
        if mask_m is not None:
            idxm, nkm = pack_idx(mask_m, bm)

        bitmaps = []
        for i in range(k):
            per = []
            if mask_m is not None:
                per.append(vrans.chan_bitmap(mask_m[i]))
            per.append(vrans.chan_bitmap(mask_c[i]))
            bitmaps.append(per)

        n8, _ = self._fused_n2(frame_type, 8, bm, bc)
        kk = self._pick_k(frame_type, n_total=n8)
        n_total, _ = self._fused_n2(frame_type, kk, bm, bc)
        cols = []
        if frame_type != FRAME_I:
            cols.append(0)
            if bm:
                cols.append(1)
        cols.append(2)
        if bc:
            cols.append(3)

        z_qm, y_cqm, bins_m = (handles["z_qm"], handles["y_cqm"],
                               handles["bins_m"])
        z_qc, y_cqc, bins_c = (handles["z_qc"], handles["y_cqc"],
                               handles["bins_c"])
        pal = self._use_pallas_enc(n_total, kk)
        if pal:
            interp = pal == "interpret"
            cdf512 = self.vr_dec.cdf512_f32
            if frame_type == FRAME_I:
                res = self._vrenc2_i_pal(z_qc, y_cqc[0], bins_c, idxc, nkc,
                                         cdf512, k=kk, bc=bc,
                                         interpret=interp)
            else:
                res = self._vrenc2_pb_pal(z_qm, y_cqm[0], bins_m, idxm,
                                          nkm, z_qc, y_cqc[0], bins_c,
                                          idxc, nkc, cdf512, k=kk, bm=bm,
                                          bc=bc, interpret=interp)
            fmt = "pallas"
        else:
            if frame_type == FRAME_I:
                res = self._vrenc2_i(z_qc, y_cqc[0], bins_c, idxc, nkc,
                                     self.vr_enc, k=kk, bc=bc)
            else:
                res = self._vrenc2_pb(z_qm, y_cqm[0], bins_m, idxm, nkm,
                                      z_qc, y_cqc[0], bins_c, idxc, nkc,
                                      self.vr_enc, k=kk, bm=bm, bc=bc)
            fmt = "xla"
        handles["vr"] = {"res": res, "k": kk, "fmt": fmt, "v2": True,
                         "bm": bm, "bc": bc, "bitmaps": bitmaps,
                         "cols": cols,
                         "idx": (idxm, nkm, idxc, nkc)}

    def _use_pallas_enc(self, n_total: int, k: int):
        """Route the fused encode through the Pallas kernel?  Same stream
        bytes either way; auto = on TPU when the chunk fits VMEM.
        Returns False | True | 'interpret' (the latter for CPU tests)."""
        import os

        mode = os.environ.get("AIVC_VRANS_ENC", "auto")
        if mode == "xla" or not vrans._enc_pallas_ok(n_total, k):
            return False
        if mode == "interpret":
            return "interpret"
        if mode == "pallas":
            return True
        return (jax.default_backend() == "tpu"
                and self._fused14.shape[0] <= vrans.PROBE_ROWS
                and vrans.pallas_runtime_ok("enc", k // 128,
                                            self.n_symbols))

    def _fused_rows_np(self, handles, i: int):
        """Host-side reconstruction of frame i's fused (symbols, rows) —
        debug mode only (mirrors the device-side segment construction)."""
        k = handles["vr"]["k"]
        OFF, PAD = self._row_off, self._pad_sym
        syms, rows = [], []

        def pad_to(v, r, pad_sym, pad_row):
            pad = (-v.size) % k
            syms.append(np.concatenate(
                [v, np.full(pad, pad_sym, np.int64)]))
            rows.append(np.concatenate(
                [r, np.full(pad, pad_row, np.int64)]))

        ACV = self.ac_max

        def add_z(zq, fam):
            v = zq.reshape(-1).astype(np.int64) + ACV
            r = np.broadcast_to(
                np.arange(zq.shape[-1], dtype=np.int64) + OFF[fam],
                zq.shape).reshape(-1)
            pad_to(v, r, PAD[fam], OFF[fam])

        def add_y(y, b):
            v = y.reshape(-1).astype(np.int64) + ACV
            r = b.reshape(-1).astype(np.int64) + OFF["y"]
            pad_to(v, r, PAD["y"], OFF["y"])

        def add_y_el(y, b, idx_i, nk_i, bucket):
            """v2: channel-major kept channels; per-frame slots beyond
            nkeep carry the pad symbol (mirrors _y_seg_el)."""
            H, W, C = y.shape
            hw = H * W
            yt = y.transpose(2, 0, 1).reshape(C, hw)
            bt = b.transpose(2, 0, 1).reshape(C, hw)
            v = np.full(bucket * hw, PAD["y"], np.int64)
            r = np.full(bucket * hw, OFF["y"], np.int64)
            for j in range(int(nk_i)):
                c = int(idx_i[j])
                v[j * hw:(j + 1) * hw] = yt[c].astype(np.int64) + ACV
                r[j * hw:(j + 1) * hw] = bt[c].astype(np.int64) + OFF["y"]
            pad_to(v, r, PAD["y"], OFF["y"])

        vr = handles["vr"]
        if vr.get("v2"):
            idxm, nkm, idxc, nkc = [None if a is None else np.asarray(a)
                                    for a in vr["idx"]]
            if handles["frame_type"] != FRAME_I:
                add_z(np.asarray(handles["z_qm"], np.int32)[i], "z_m")
                if vr["bm"]:
                    add_y_el(np.asarray(handles["y_cqm"][0], np.int32)[i],
                             np.asarray(handles["bins_m"], np.int32)[i],
                             idxm[i], nkm[i], vr["bm"])
            add_z(np.asarray(handles["z_qc"], np.int32)[i], "z_c")
            if vr["bc"]:
                add_y_el(np.asarray(handles["y_cqc"][0], np.int32)[i],
                         np.asarray(handles["bins_c"], np.int32)[i],
                         idxc[i], nkc[i], vr["bc"])
            return np.concatenate(syms), np.concatenate(rows)

        if handles["frame_type"] != FRAME_I:
            add_z(np.asarray(handles["z_qm"], np.int32)[i], "z_m")
            add_y(np.asarray(handles["y_cqm"][0], np.int32)[i],
                  np.asarray(handles["bins_m"], np.int32)[i])
        add_z(np.asarray(handles["z_qc"], np.int32)[i], "z_c")
        add_y(np.asarray(handles["y_cqc"][0], np.int32)[i],
              np.asarray(handles["bins_c"], np.int32)[i])
        return np.concatenate(syms), np.concatenate(rows)

    def _debug_vr_frame(self, handles, chunks_i: Dict[str, bytes], i: int):
        """Fused-chunk lossless self-check + analytic-vs-real rate for the
        device backend (reference: bitstream.py:307-350)."""
        from aivc_tpu.coding.cdf import expected_bits

        payload = chunks_i["codecnet_z"]
        syms, rows = self._fused_rows_np(handles, i)
        back = vrans.decode_chunk(payload, rows.astype(np.int32),
                                  self.vr_dec)
        lossless = np.array_equal(back.astype(np.int64), syms)
        est = expected_bits(syms, rows, self._fused14) / 8.0
        print(f"[AC-dev] fused[{i}]: {len(payload)}B real, "
              f"{est:.1f}B analytic, "
              f"{'lossless Ok!' if lossless else 'NOT LOSSLESS Ko!'}")
        if not lossless:
            raise AssertionError(
                f"device entropy coding not lossless: frame {i}")

    def _wave_digests(self, handles):
        """Per-frame in-band latent digests (debug mode): md5 of each
        decoded latent tensor keyed by logical chunk name, embedded in the
        frame container so drift detection travels WITH the stream and
        the decoder names the exact latent that rotted (reference embeds
        per-latent md5s the same way under its debug flag,
        src/real_life/bitstream.py:229-234,419-421,488-499)."""
        k = handles["k"]
        digs = [dict() for _ in range(k)]
        z_qc = np.asarray(handles["z_qc"], np.int32)
        # y handles are (q16, ...) tuples — 3 host views on the host
        # backend, 1 on the device backend; [0] is the int16 latent in
        # both (see y_quant/y_quant_dev).
        y_qc = np.asarray(handles["y_cqc"][0], np.int32)
        for i in range(k):
            digs[i]["codecnet_z"] = bs.latent_md5(z_qc[i])
            digs[i]["codecnet_y"] = bs.latent_md5(y_qc[i])
        if handles["frame_type"] != FRAME_I:
            z_qm = np.asarray(handles["z_qm"], np.int32)
            y_qm = np.asarray(handles["y_cqm"][0], np.int32)
            for i in range(k):
                digs[i]["mofnet_z"] = bs.latent_md5(z_qm[i])
                digs[i]["mofnet_y"] = bs.latent_md5(y_qm[i])
        return digs

    @staticmethod
    def _verify_latent(digests, i: int, name: str, arr) -> None:
        """Decoder-side check of one in-band latent digest (no-op when the
        stream carries none)."""
        if digests[i] and name in digests[i]:
            got = bs.latent_md5(arr)
            if got != digests[i][name]:
                raise ValueError(
                    f"bitstream debug: latent md5 mismatch at frame {i} "
                    f"chunk {name} — decoded latent differs from the "
                    f"encoder's (corrupt or mismatched stream)")

    def encode_frames_finish(self, handles):
        """Host half of a launched wave.

        Device backend: pull compressed words only (the device already
        entropy-coded every chunk).  Host backend: pull integers, range-
        code on host threads, pack.
        """
        k = handles["k"]
        frame_type = handles["frame_type"]
        per_frame_chunks = [dict() for _ in range(k)]
        stats = [dict() for _ in range(k)]

        if self.backend == "device":
            if "vr" not in handles:
                # v2 (elided) path: the fused encode could not launch
                # until the channel masks reached the host.
                self._launch_vr2(handles)
            vr = handles["vr"]
            kk = vr["k"]

            def _ser(i, words):
                if vr.get("v2"):
                    return vrans.serialize_chunk_v2(
                        kk, states_np[i], words, vr["bitmaps"][i])
                return vrans.serialize_chunk(kk, states_np[i], words)

            if vr.get("fmt") == "pallas":
                # Kernel layout: words of frame i are buf[i, seg_g[i,0]:g0]
                # (decode order, descending-cursor write); segment counts
                # are cursor diffs.  One bucketed suffix pull serves the
                # whole wave.
                buf, states, seg_g, g0 = vr["res"]
                g0 = int(g0)   # jit turns the static int output into an array
                seg_g_np = np.asarray(seg_g)
                states_np = np.asarray(states)
                totals_np = g0 - seg_g_np[:, 0]
                bounds = np.concatenate(
                    [seg_g_np, np.full((k, 1), g0, seg_g_np.dtype)], axis=1)
                segw_np = np.diff(bounds, axis=1)
                mmax = int(totals_np.max())
                rows = None
                if mmax > 0:
                    m = vrans.bucket(mmax, g0)
                    rows = np.asarray(self._window_cols(buf, end=g0, m=m))
                for i in range(k):
                    t = int(totals_np[i])
                    words = (rows[i, rows.shape[1] - t:]
                             if t > 0 else np.empty(0, np.uint16))
                    per_frame_chunks[i]["codecnet_z"] = _ser(i, words)
            else:
                buf, states, totals, segw = vr["res"]
                totals_np = np.asarray(totals)
                states_np = np.asarray(states)
                segw_np = np.asarray(segw)
                mmax = int(totals_np.max())
                rows = None
                if mmax > 0:
                    m = vrans.bucket(mmax, buf.shape[1])
                    rows = np.asarray(self._prefix_cols(buf, m=m))
                for i in range(k):
                    t = int(totals_np[i])
                    words = rows[i, :t] if t > 0 else np.empty(0, np.uint16)
                    # One fused chunk per frame, carried in the first
                    # present chunk slot of the reference's 4-chunk frame
                    # container.
                    per_frame_chunks[i]["codecnet_z"] = _ser(i, words)
            # Map per-part word counts onto the fixed (z_m, y_m, z_c, y_c)
            # columns (parts present vary with frame type and elision).
            full4 = np.zeros((k, 4), segw_np.dtype)
            full4[:, vr["cols"]] = segw_np
            segw_np = full4
            if frame_type == FRAME_I:
                for s in stats:
                    s["alpha_mean"] = 1.0
                    s["beta_mean"] = 1.0
            else:
                a_means = np.asarray(handles["mof"]["alpha_mean"])
                b_means = np.asarray(handles["mof"]["beta_mean"])
                for i in range(k):
                    stats[i]["alpha_mean"] = float(a_means[i])
                    stats[i]["beta_mean"] = float(b_means[i])
            digs = None
            if self.debug:
                digs = self._wave_digests(handles)
                for i in range(k):
                    self._debug_vr_frame(handles, per_frame_chunks[i], i)
            frame_bytes = []
            for i in range(k):
                fb = bs.pack_frame(per_frame_chunks[i],
                                   digs[i] if digs else None)
                frame_bytes.append(fb)
                stats[i]["bytes"] = len(fb)
                # Per-net byte split from the fused stream's per-segment
                # word counts (informational; the state flush + header are
                # not attributed).  segw_np is 4-col mapped above.
                stats[i]["mode_bytes"] = 2 * int(segw_np[i, :2].sum())
                stats[i]["codec_bytes"] = 2 * int(segw_np[i, 2:].sum())
            self._update_k_hint(
                frame_type,
                int(np.mean([len(fbx) for fbx in frame_bytes])))
            self._attach_audit(handles, stats)
            return frame_bytes, handles["decoded"], stats

        jobs = []  # (frame_idx, chunk_name, fn) — rANS runs in threads:
        # the C range coder releases the GIL, so a wave's chunks encode
        # concurrently on the host cores.
        if frame_type == FRAME_I:
            for s in stats:
                s["alpha_mean"] = 1.0
                s["beta_mean"] = 1.0
        else:
            mof = handles["mof"]
            z_np = np.asarray(handles["z_qm"], np.int32)
            y_np = self._pull_y(handles["y_cqm"])
            b_np = np.asarray(handles["bins_m"])
            for i in range(k):
                jobs.append((i, "mofnet_z", functools.partial(
                    self._encode_z, "mofnet", z_np[i], f"mofnet_z[{i}]")))
                jobs.append((i, "mofnet_y", functools.partial(
                    self._encode_y, y_np[i], b_np[i], f"mofnet_y[{i}]")))
            a_means = np.asarray(mof["alpha_mean"])
            b_means = np.asarray(mof["beta_mean"])
            for i in range(k):
                stats[i]["alpha_mean"] = float(a_means[i])
                stats[i]["beta_mean"] = float(b_means[i])

        z_np = np.asarray(handles["z_qc"], np.int32)
        y_np = self._pull_y(handles["y_cqc"])
        b_np = np.asarray(handles["bins_c"])
        for i in range(k):
            jobs.append((i, "codecnet_z", functools.partial(
                self._encode_z, "codecnet", z_np[i], f"codecnet_z[{i}]")))
            jobs.append((i, "codecnet_y", functools.partial(
                self._encode_y, y_np[i], b_np[i], f"codecnet_y[{i}]")))

        if self.debug or len(jobs) <= 1:
            for i, name, fn in jobs:
                per_frame_chunks[i][name] = fn()
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(4, len(jobs))) as ex:
                futs = [(i, name, ex.submit(fn)) for i, name, fn in jobs]
                for i, name, fut in futs:
                    per_frame_chunks[i][name] = fut.result()

        digs = self._wave_digests(handles) if self.debug else None
        frame_bytes = []
        for i in range(k):
            fb = bs.pack_frame(per_frame_chunks[i],
                               digs[i] if digs else None)
            frame_bytes.append(fb)
            c = per_frame_chunks[i]
            stats[i]["bytes"] = len(fb)
            stats[i]["mode_bytes"] = len(c.get("mofnet_z", b"")) + len(
                c.get("mofnet_y", b""))
            stats[i]["codec_bytes"] = len(c["codecnet_z"]) + len(c["codecnet_y"])
        self._attach_audit(handles, stats)
        return frame_bytes, handles["decoded"], stats

    @staticmethod
    def _attach_audit(handles, stats):
        if "abits" in handles:
            ab = np.asarray(handles["abits"])
            for i, s in enumerate(stats):
                s["analytic_bits"] = float(ab[i])

    def encode_frames_batch(self, frames_u8, prev_refs, next_refs,
                            frame_type: int, idx_rate: float):
        """Code k same-type frames as one device batch (launch + finish)."""
        return self.encode_frames_finish(self.encode_frames_launch(
            frames_u8, prev_refs, next_refs, frame_type, idx_rate))

    def encode_frame(self, frame_u8: Dict[str, np.ndarray],
                     prev_ref: Optional[jax.Array],
                     next_ref: Optional[jax.Array],
                     frame_type: int, idx_rate: float
                     ) -> Tuple[bytes, "DecodedFrame", Dict]:
        """Single-frame convenience wrapper over encode_frames_batch."""
        fbs, decs, stats = self.encode_frames_batch(
            [frame_u8], [prev_ref], [next_ref], frame_type, idx_rate)
        return fbs[0], decs[0], stats[0]

    def _decode_frames_device(self, chunks, prev, nxt, rate, k: int,
                              frame_type: int):
        """Decode a wave with on-device staged entropy decoding of the
        fused per-frame stream: ONE words push per wave; latents, sigma
        bins, stream states and word offsets never leave the device."""
        p = self.params
        # In-band debug digests (if the stream carries them) cost one
        # device->host pull per latent batch — debug streams only.
        digests = [c.get("__digests__") for c in chunks]
        check = any(digests)
        payloads = [c["codecnet_z"] for c in chunks]
        parsed = [vrans.parse_chunk_v2(pl) for pl in payloads]
        kk = parsed[0][2]
        if any(pk != kk for _, _, pk, _ in parsed):
            raise ValueError("inconsistent vrans stream counts in a wave")
        v2 = parsed[0][3] is not None
        if any((pb is not None) != v2 for _, _, _, pb in parsed):
            raise ValueError("mixed v1/v2 vrans chunks in a wave")
        cm = self.cfg.mofnet.nb_ft_y
        cc = self.cfg.codecnet.nb_ft_y
        if v2:
            # Derive the wave-shared buckets + per-frame kept channels
            # from the bitstream bitmaps — the decoder's counterpart of
            # _launch_vr2's mask pull, guaranteeing identical segments.
            ch_m, ch_c = [], []
            for _, _, _, bms in parsed:
                if frame_type != FRAME_I:
                    ch_m.append(vrans.bitmap_channels(bms[0], cm))
                    ch_c.append(vrans.bitmap_channels(bms[1], cc))
                else:
                    ch_c.append(vrans.bitmap_channels(bms[0], cc))
            bc = vrans.elide_bucket(max(c.size for c in ch_c), cc)
            bm = (vrans.elide_bucket(max(c.size for c in ch_m), cm)
                  if ch_m else 0)

            def pack_idx(chs, bucket):
                idx = np.zeros((k, max(bucket, 1)), np.int32)
                nk = np.zeros((k,), np.int32)
                for i, ch in enumerate(chs):
                    nk[i] = ch.size
                    idx[i, :ch.size] = ch
                return jnp.asarray(idx), jnp.asarray(nk)

            idxc, nkc = pack_idx(ch_c, bc)
            idxm, nkm = pack_idx(ch_m, bm) if ch_m else (None, None)
            _, segs = self._fused_n2(frame_type, kk, bm, bc)
        else:
            _, segs = self._fused_n(frame_type, kk)
        seg_it = iter(segs)
        mmax = max(w.size for w, _, _, _ in parsed)
        m = vrans.bucket(max(mmax, 1), 1 << 30)
        wb = np.zeros((len(parsed), m), np.uint16)
        for i, (w, _, _, _) in enumerate(parsed):
            wb[i, :w.size] = w
        words = jnp.asarray(wb)
        st = jnp.asarray(np.stack([s for _, s, _, _ in parsed]))
        g = jnp.zeros((len(parsed),), jnp.int32)
        t = self.vr_dec

        if frame_type == FRAME_I:
            pred = jnp.zeros((k, self.hp, self.wp, 3), jnp.float32)
            skip = jnp.zeros_like(pred)
        else:
            z_qm, st, g = self._vrdec_seg_z(
                words, st, g, t, n=next(seg_it), k=kk,
                shape=(self.hz, self.wz, self.cfg.mofnet.nb_ft_z),
                off=self._row_off["z_m"])
            mu_m, bins_m = self._mof_hyper(p, z_qm)
            yshape_m = (self.hy, self.wy, cm)
            if not v2:
                y_cqm, st, g = self._vrdec_seg_y(
                    words, st, g, bins_m, t, n=next(seg_it), k=kk,
                    shape=yshape_m)
            elif bm:
                y_cqm, st, g = self._vrdec_seg_y_el(
                    words, st, g, bins_m, idxm, nkm, t, n=next(seg_it),
                    k=kk, shape=yshape_m, bucket=bm)
            else:
                y_cqm = jnp.zeros((k,) + yshape_m, jnp.int16)
            if check:
                zs, ys = np.asarray(z_qm), np.asarray(y_cqm)
                for i in range(k):
                    self._verify_latent(digests, i, "mofnet_z", zs[i])
                    self._verify_latent(digests, i, "mofnet_y", ys[i])
            mof = self._mof_synth(p, y_cqm, mu_m, prev, nxt, rate,
                                  ftype=frame_type)
            pred, skip = mof["pred"], mof["skip"]

        z_qc, st, g = self._vrdec_seg_z(
            words, st, g, t, n=next(seg_it), k=kk,
            shape=(self.hz, self.wz, self.cfg.codecnet.nb_ft_z),
            off=self._row_off["z_c"])
        mu_c, bins_c = self._cod_hyper(p, z_qc)
        yshape_c = (self.hy, self.wy, cc)
        if not v2:
            y_cqc, st, g = self._vrdec_seg_y(
                words, st, g, bins_c, t, n=next(seg_it), k=kk,
                shape=yshape_c)
        elif bc:
            y_cqc, st, g = self._vrdec_seg_y_el(
                words, st, g, bins_c, idxc, nkc, t, n=next(seg_it),
                k=kk, shape=yshape_c, bucket=bc)
        else:
            y_cqc = jnp.zeros((k,) + yshape_c, jnp.int16)
        if check:
            zs, ys = np.asarray(z_qc), np.asarray(y_cqc)
            for i in range(k):
                self._verify_latent(digests, i, "codecnet_z", zs[i])
                self._verify_latent(digests, i, "codecnet_y", ys[i])
        planes_dev, ref444 = self._cod_synth(p, y_cqc, mu_c, pred, skip,
                                             rate, ftype=frame_type)
        return self._split_decoded(planes_dev, ref444, k,
                                   eager_pull=True)

    def decode_frames_batch(self, frame_bytes_list, prev_refs, next_refs,
                            frame_type: int, idx_rate: float,
                            backend: Optional[str] = None):
        """Decode k same-type frames as one device batch.

        MUST be called with the same grouping the encoder used: XLA may
        round floats differently per batch size, so the wave grouping is
        part of the enc/dec determinism contract (both sides derive it
        from the GOP structure alone).

        backend: which chunk format the bitstream carries ('device' |
        'host'); defaults to this codec's encoding backend.  decode_video
        passes the video header's flag, so either codec decodes either
        format.
        """
        k = len(frame_bytes_list)
        p = self.params
        prev = self._stack_refs(prev_refs)
        nxt = self._stack_refs(next_refs)
        if self.mesh is not None:
            prev = self._shard_batch(prev)
            nxt = self._shard_batch(nxt)
        rate = jnp.float32(idx_rate)
        chunks = [bs.unpack_frame(fb) for fb in frame_bytes_list]
        digests = [c.get("__digests__") for c in chunks]

        if (backend or self.backend) == "device":
            return self._decode_frames_device(chunks, prev, nxt, rate, k,
                                              frame_type)

        zshape_m = (self.hz, self.wz, self.cfg.mofnet.nb_ft_z)
        zshape_c = (self.hz, self.wz, self.cfg.codecnet.nb_ft_z)
        yshape_m = (self.hy, self.wy, self.cfg.mofnet.nb_ft_y)
        yshape_c = (self.hy, self.wy, self.cfg.codecnet.nb_ft_y)

        if frame_type == FRAME_I:
            pred = jnp.zeros((k, self.hp, self.wp, 3), jnp.float32)
            skip = jnp.zeros_like(pred)
        else:
            z_qm = np.stack(self._par_map(
                lambda c: bs.decode_z_chunk(c["mofnet_z"], zshape_m,
                                            self.z_rows["mofnet"]), chunks))
            mu_m, bins_m = self._mof_hyper(p, jnp.asarray(z_qm, jnp.float32))
            bins_np = np.asarray(bins_m)
            y_cqm = np.stack(self._par_map(
                lambda ic: bs.decode_y_chunk(ic[1]["mofnet_y"], yshape_m,
                                             bins_np[ic[0]],
                                             self.laplace_rows),
                list(enumerate(chunks))))
            for i in range(k):
                self._verify_latent(digests, i, "mofnet_z", z_qm[i])
                self._verify_latent(digests, i, "mofnet_y", y_cqm[i])
            mof = self._mof_synth(p, jnp.asarray(y_cqm), mu_m, prev, nxt,
                                  rate, ftype=frame_type)
            pred, skip = mof["pred"], mof["skip"]

        z_qc = np.stack(self._par_map(
            lambda c: bs.decode_z_chunk(c["codecnet_z"], zshape_c,
                                        self.z_rows["codecnet"]), chunks))
        mu_c, bins_c = self._cod_hyper(p, jnp.asarray(z_qc, jnp.float32))
        bins_np = np.asarray(bins_c)
        y_cqc = np.stack(self._par_map(
            lambda ic: bs.decode_y_chunk(ic[1]["codecnet_y"], yshape_c,
                                         bins_np[ic[0]], self.laplace_rows),
            list(enumerate(chunks))))
        for i in range(k):
            self._verify_latent(digests, i, "codecnet_z", z_qc[i])
            self._verify_latent(digests, i, "codecnet_y", y_cqc[i])
        planes_dev, ref444 = self._cod_synth(p, jnp.asarray(y_cqc), mu_c,
                                             pred, skip, rate,
                                             ftype=frame_type)
        return self._split_decoded(planes_dev, ref444, k,
                                   eager_pull=True)

    def decode_frame(self, frame_bytes: bytes,
                     prev_ref: Optional[jax.Array],
                     next_ref: Optional[jax.Array],
                     frame_type: int, idx_rate: float,
                     backend: Optional[str] = None) -> "DecodedFrame":
        """Single-frame convenience wrapper over decode_frames_batch."""
        return self.decode_frames_batch(
            [frame_bytes], [prev_ref], [next_ref], frame_type, idx_rate,
            backend=backend)[0]

    # ------------------------------------------------------------------
    @property
    def sched_bits(self) -> int:
        """Compute-schedule byte recorded in the video header (bit0 =
        lane-packed heads, bit1 = low-precision GDN, bit2 = channel-major
        MOFNet maps, bit3 = space-to-depth analysis convs) — part of the
        bit-exact decode contract, like wave_batch."""
        return ((1 if self.cfg.codecnet.head_lane_pack > 1 else 0)
                | (2 if self.cfg.codecnet.gdn_lowp else 0)
                | (4 if self.cfg.mofnet.maps_cm else 0)
                | (8 if self.cfg.codecnet.s2d_analysis else 0))

    def check_sched(self, header: bs.VideoHeader) -> None:
        """Raise if this codec's compute schedule differs from the
        stream's: the schedule changes float sum order, so a mismatched
        decoder would drift from the encoder's reconstructions through
        the GOP reference chain instead of failing."""
        if header.sched != self.sched_bits:
            raise ValueError(
                f"bitstream compute schedule {header.sched:#04x} != this "
                f"codec's {self.sched_bits:#04x}; set AIVC_PACKED_HEAD="
                f"{1 if header.sched & 1 else 0} AIVC_GDN_LOWP="
                f"{1 if header.sched & 2 else 0} AIVC_MAPS_CM="
                f"{1 if header.sched & 4 else 0} AIVC_S2D="
                f"{1 if header.sched & 8 else 0} and rebuild the codec "
                f"to decode this stream bit-exactly")

    def video_header(self, nb_gop: int, idx_first: int, idx_last: int,
                     wave_batch: int = 1) -> bs.VideoHeader:
        return bs.VideoHeader(
            h_x=self.h, w_x=self.w, h_y=self.hy, w_y=self.wy,
            h_z=self.hz, w_z=self.wz, nb_gop=nb_gop,
            idx_first_frame=idx_first, idx_last_frame=idx_last,
            backend=(bs.BACKEND_DEVICE if self.backend == "device"
                     else bs.BACKEND_HOST),
            wave_batch=max(1, wave_batch),
            ac_log2=self.ac_max.bit_length() - 1,
            sched=self.sched_bits)
