from aivc_tpu.models.conditional import ConditionalNet  # noqa: F401
from aivc_tpu.models.fullnet import FullNet  # noqa: F401
from aivc_tpu.models.zoo import MODEL_ZOO, TINY, get_model, init_fullnet  # noqa: F401
