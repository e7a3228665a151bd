from lpi_tpu.serve.predictor import GroundingPredictor, find_noun_phrases  # noqa: F401
