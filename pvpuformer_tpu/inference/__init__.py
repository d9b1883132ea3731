from .predictor import PredictorConfig, Predictor, SessionState, init_session
from .evaluation import (evaluate_dataset, evaluate_sample, compute_noc_metric,
                         get_results_table, get_time_metrics, get_iou)
