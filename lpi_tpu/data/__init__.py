from lpi_tpu.data.catalog import CATALOG, DatasetCatalog, try_to_find  # noqa: F401
from lpi_tpu.data.tokenizer import ClipTokenizer  # noqa: F401
