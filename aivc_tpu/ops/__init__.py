from aivc_tpu.ops.warp import warp, motion_compensation  # noqa: F401
from aivc_tpu.ops.gdn import GDN, gdn_apply, gdn_pallas, lower_bound  # noqa: F401
from aivc_tpu.ops.quantizer import quantize, ste_round  # noqa: F401
from aivc_tpu.ops.gain import GainMatrix, interpolate_gain  # noqa: F401
from aivc_tpu.ops.entropy_models import (  # noqa: F401
    FactorizedPrior,
    bin_prob,
    laplace_bin_prob,
    normal_bin_prob,
    pdf_parameterize,
    rate_bits,
)
from aivc_tpu.ops.layers import (  # noqa: F401
    ConvBlock,
    UpBlock,
    ResBlock,
    ChengResBlock,
    SimplifiedAttention,
    replication_pad,
    yuv420_to_444,
    x444_to_yuv420,
)
from aivc_tpu.ops.metrics import (  # noqa: F401
    psnr,
    ssim,
    msssim,
    msssim_db,
    yuv_mse,
    yuv_psnr,
    yuv_msssim,
)
