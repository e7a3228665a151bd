from lpi_tpu.core import config, mesh  # noqa: F401
