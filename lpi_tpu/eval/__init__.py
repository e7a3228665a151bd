from lpi_tpu.eval.retrieval import itm_eval, aggregate_results  # noqa: F401
from lpi_tpu.eval.refexp import RefExpEvaluator  # noqa: F401
from lpi_tpu.eval.coco_ap import evaluate_detections  # noqa: F401
from lpi_tpu.eval.flickr import FlickrEvaluator  # noqa: F401
from lpi_tpu.eval.voc import eval_detection_voc, voc_ap, voc_prec_rec  # noqa: F401
from lpi_tpu.eval.lvis import LvisEvaluator  # noqa: F401
