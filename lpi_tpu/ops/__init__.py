from lpi_tpu.ops.kmeans import kmeans  # noqa: F401
