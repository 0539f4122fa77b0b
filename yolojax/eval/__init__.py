from yolojax.eval.voc_map import voc_ap, compute_map  # noqa: F401
from yolojax.eval.evaluator import evaluate_model  # noqa: F401
