from lpi_tpu.core import config, mesh, pipeline  # noqa: F401
