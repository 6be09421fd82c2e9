from aivc_tpu.pipeline.codec import FrameCodec, pad_to_multiple  # noqa: F401
from aivc_tpu.pipeline.video import (  # noqa: F401
    EncodeResult,
    decode_video,
    encode_video,
    evaluate_frames,
)
