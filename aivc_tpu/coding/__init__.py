from aivc_tpu.coding import range_coder, cdf, bitstream  # noqa: F401
