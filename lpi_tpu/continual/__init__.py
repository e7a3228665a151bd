from lpi_tpu.continual.keys import TaskKeys, infer_task_ids  # noqa: F401
from lpi_tpu.continual.freeze import trainable_mask, mask_grads  # noqa: F401
