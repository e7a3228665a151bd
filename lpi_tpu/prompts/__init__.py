from lpi_tpu.prompts.pools import (  # noqa: F401
    DecomposedPromptPool,
    NormalPromptPool,
    L2pPrompt,
    build_prompt_pool,
)
