from lpi_tpu.continual.keys import TaskKeys, infer_task_ids  # noqa: F401
from lpi_tpu.continual.freeze import trainable_mask, mask_grads  # noqa: F401
from lpi_tpu.continual.early_stop import EarlyStopper  # noqa: F401
from lpi_tpu.continual.exemplars import ExemplarMemory, herding_selection  # noqa: F401
from lpi_tpu.continual.schedules import (  # noqa: F401
    WarmupReduceLROnPlateau,
    warmup_cosine,
    warmup_multistep,
)
