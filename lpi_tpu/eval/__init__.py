from lpi_tpu.eval.retrieval import itm_eval, aggregate_results  # noqa: F401
