from lpi_tpu.models.glip.swin import SwinTransformer  # noqa: F401
from lpi_tpu.models.glip.bert import BertEmbeddings, BertLayer  # noqa: F401
from lpi_tpu.models.glip.fused import FusedDualEncoder, InteractModulePool  # noqa: F401
from lpi_tpu.models.glip.atss_head import ATSSDetHead, atss_class_losses  # noqa: F401
