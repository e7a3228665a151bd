from lpi_tpu.data.tokenizer import ClipTokenizer  # noqa: F401
