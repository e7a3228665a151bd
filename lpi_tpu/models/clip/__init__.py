from lpi_tpu.models.clip.model import (  # noqa: F401
    CLIP,
    TextTransformer,
    VisionTransformer,
)
from lpi_tpu.models.clip.slinet import SliNet  # noqa: F401
