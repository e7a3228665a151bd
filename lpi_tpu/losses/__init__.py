from lpi_tpu.losses.clip_loss import (  # noqa: F401
    clip_loss,
    global_clip_loss,
    alignment_loss,
    nt_bxent_loss,
    nt_bxent_loss_masked,
    task_prompt_loss,
    task_prompt_loss_masked,
    info_nce,
)
